"""Single-thread cProfile of the extraction kernel (no Spark).

The headline bench number is `extract_transcripts` throughput, which is
this kernel times cores; profiling it pure-Python finds single-thread
hotspots without launching a JVM. Generates the same synthetic payloads
the bench corpus uses (data/gen.py) so the profile matches the measured
distribution.

Usage: python tools/profile_kernel.py [n_turns=20000]
"""

from __future__ import annotations

import cProfile
import os
import pstats
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    from glm_ocr_spark.data.gen import gen_turn_payload
    from glm_ocr_spark.kernel.extract import extract_turn

    payloads = []
    for conv in range(max(1, n // 128)):
        cid = f"conv-{conv:06d}"
        for t in range(128):
            if len(payloads) >= n:
                break
            _, text, tool = gen_turn_payload(cid, t)
            if not tool:  # pipeline skips tool turns before the kernel
                payloads.append(text)

    # warm (imports, regex compiles, wordfreq snapshot load)
    for p in payloads[:200]:
        extract_turn(p)

    t0 = time.time()
    for p in payloads:
        extract_turn(p)
    dt = time.time() - t0
    print(f"plain: {len(payloads)} turns in {dt:.2f}s = "
          f"{len(payloads) / dt:.0f} turns/s/core")

    prof = cProfile.Profile()
    prof.enable()
    for p in payloads:
        extract_turn(p)
    prof.disable()
    stats = pstats.Stats(prof)
    stats.sort_stats("cumulative").print_stats(25)
    stats.sort_stats("tottime").print_stats(25)


if __name__ == "__main__":
    main()
