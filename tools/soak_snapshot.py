"""Snapshot-path scale soak: 3x bench corpus through the snapshot-commit batch path
(extract + parquet write + footer metrics + atomic manifest commit),
then a bucket-COW MERGE with the new manifest-validated bucketing, then
an expiry GC pass with the re-list dir guard."""
import sys
import time

sys.path.insert(0, '/root/repo')
from pyspark.sql import functions as F

from glm_ocr_spark.pipeline import get_spark

spark = get_spark(master='local[16]')
spark.sparkContext.setLogLevel('ERROR')

# 3x the sf0.1 bench corpus with distinct conv ids per replica
base = spark.read.parquet('/root/repo/.bench/transcripts_sf0.1_v2')
reps = None
for i in range(3):
    r = base.withColumn('conv_id', F.concat(F.lit(f'r{i}_'), 'conv_id'))
    reps = r if reps is None else reps.unionByName(r)
n_in = reps.count()
print('input turns:', n_in)

import shutil

root = '/tmp/soak_snapshot_cat'
shutil.rmtree(root, ignore_errors=True)

from glm_ocr_spark.snapshot import SnapshotStore, merge_upsert, run_with_snapshots

t0 = time.time()
m = run_with_snapshots(spark, reps, root, n_buckets=64, buckets_per_commit=16)  # 4 atomic commits; None = single commit
dt = time.time() - t0
print(f'snapshot batch: {dt:.1f}s = {n_in/dt:.0f} rows/s end-to-end '
      f'(commits={m["commits"]}, snapshot={m["snapshot_id"]})')

store = SnapshotStore(root)
out = store.read_output(spark)
n_out = out.count()
assert n_out == n_in, (n_out, n_in)
rows_state = store.state_rows()
assert sum(r['rows_out'] for r in rows_state) == n_in
print('output + watermark rows consistent:', n_out)

# MERGE a 10k-row late-correction batch (manifest-derived bucketing)
upd = (out.drop('bucket').limit(10000)
       .withColumn('extracted_text', F.lit('LATE-FIX')))
t1 = time.time()
mm = merge_upsert(spark, store, upd, ['conv_id', 'turn_idx'])
dt1 = time.time() - t1
print(f'merge_upsert 10k rows: {dt1:.1f}s, touched '
      f'{len(mm["touched_buckets"])} of 64 buckets, '
      f'rewrote {mm["rows_out"]} rows')
after = store.read_output(spark)
assert after.count() == n_in
assert after.filter("extracted_text = 'LATE-FIX'").count() == 10000

# GC: expire pre-merge snapshots, keep current
t2 = time.time()
res = store.expire_snapshots(keep_from=store.current_id())
print(f'gc: {time.time()-t2:.1f}s removed_manifests={res["removed_manifests"]} '
      f'removed_files={res["removed_files"]}')
assert store.read_output(spark).count() == n_in
print('post-GC read consistent')
spark.stop()
shutil.rmtree(root, ignore_errors=True)
print('SOAK OK')
