"""Kernel optimization A/B harness (no Spark).

Times extract_turn over the bench payload distribution and byte-compares
every output against a golden snapshot taken before the optimization pass
(--save-golden). Any drift in extracted_text/markdown/json/spans/n_blocks
fails loudly — the driver's oracle hashes require byte-identical results.

Usage:
  python tools/ab_kernel.py --save-golden [n]   # snapshot current outputs
  python tools/ab_kernel.py [n]                 # time + compare vs snapshot
"""

from __future__ import annotations

import os
import pickle
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GOLDEN = os.path.join(REPO, ".bench", "kernel_golden.pkl")


def payload_set(n: int) -> list[str]:
    from glm_ocr_spark.data.gen import gen_turn_payload

    payloads = []
    for conv in range(max(1, n // 100)):
        cid = f"conv-{conv:06d}"
        for t in range(128):
            if len(payloads) >= n:
                break
            _, text, tool = gen_turn_payload(cid, t)
            if not tool:
                payloads.append(text)
    return payloads


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 30_000
    save = "--save-golden" in sys.argv

    from glm_ocr_spark.kernel.extract import extract_turn

    payloads = payload_set(n)
    for p in payloads[:300]:  # warm imports/regex/wordfreq
        extract_turn(p)

    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for p in payloads:
            extract_turn(p)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    rate = len(payloads) / best
    print(f"{len(payloads)} turns best {best:.3f}s = {rate:.0f} turns/s/core")

    results = [extract_turn(p) for p in payloads]
    if save:
        with open(GOLDEN, "wb") as f:
            pickle.dump(results, f, protocol=4)
        print(f"golden snapshot saved: {len(results)} results -> {GOLDEN}")
        return

    with open(GOLDEN, "rb") as f:
        golden = pickle.load(f)
    assert len(golden) == len(results), \
        f"count mismatch {len(golden)} vs {len(results)} (same n?)"
    bad = 0
    for i, (g, r) in enumerate(zip(golden, results)):
        if g != r:
            bad += 1
            if bad <= 3:
                print(f"MISMATCH at payload {i}:")
                for k in g:
                    if g[k] != r[k]:
                        print(f"  {k}: golden={g[k]!r:.200} now={r[k]!r:.200}")
    if bad:
        raise SystemExit(f"PARITY FAIL: {bad}/{len(results)} turns differ")
    print(f"parity OK: {len(results)}/{len(results)} byte-identical")


if __name__ == "__main__":
    main()
