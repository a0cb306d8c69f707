#!/bin/bash
# Round-4 hardware runs, sequential on the pooled chip (one at a time so
# no run contends with another of ours). Logs to /tmp/r4hw/.
mkdir -p /tmp/r4hw
cd /root/repo
date > /tmp/r4hw/START

# 1. GB-scale (VERDICT r3 item 1a): the default config records the
#    quantum-floor cliff; the measured config is inside the competence
#    region (per-tile fill >= ~1 slot-row) at ~GB pack.
timeout 2400 python -u -m tpusparse.bench.scale --m 262144 --density 2e-3 \
  --json BENCH_scale.json > /tmp/r4hw/scale_cliff.log 2>&1
echo "scale_cliff rc=$?" >> /tmp/r4hw/STATUS
timeout 5400 python -u -m tpusparse.bench.scale --m 65536 --density 0.02 \
  --json BENCH_scale.json > /tmp/r4hw/scale_65536.log 2>&1
echo "scale_65536 rc=$?" >> /tmp/r4hw/STATUS

# 2. cli mtx on the committed FEM fixture (VERDICT r3 item 1b)
timeout 2400 python -u -m tpusparse.cli mtx data/fem_mesh_16384.mtx \
  > /tmp/r4hw/mtx.log 2>&1
echo "mtx rc=$?" >> /tmp/r4hw/STATUS

# 3. dynamic-activation plan-floor study (VERDICT r3 item 4)
timeout 3600 python -u scripts/dynamic_floor_study.py \
  --json data/dynamic_floor.json > /tmp/r4hw/dynfloor.log 2>&1
echo "dynfloor rc=$?" >> /tmp/r4hw/STATUS

# 4. gallery re-measures with trials (VERDICT r3 item 5): the rows the
#    verdict flagged — >1.0-roofline artifacts, the blockpruned B=32 tie,
#    and the stencil2d-64 B-noise.
for spec in "blockpruned-4096 1" "blockpruned-4096 32" "blockpruned-4096 8" \
            "mesh2d-96 1" "stencil2d-64 1" "stencil2d-64 8" "stencil2d-64 32"; do
  set -- $spec
  timeout 2400 python -u -m tpusparse.cli gallery --workloads "$1" \
    --batch "$2" --trials 5 --json BENCH_gallery.json \
    > "/tmp/r4hw/gal_$1_B$2.log" 2>&1
  echo "gal_$1_B$2 rc=$?" >> /tmp/r4hw/STATUS
done
date > /tmp/r4hw/DONE
