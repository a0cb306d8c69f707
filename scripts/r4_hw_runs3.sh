#!/bin/bash
# Round-4 hardware runs, reordered: must-have artifacts first.
# Replaces the tails of r4_hw_runs.sh / r4_hw_runs2.sh (killed after the
# blockpruned-B1 gallery run to prioritize the GB-scale rerun).
mkdir -p /tmp/r4hw
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
# wait for the in-flight blockpruned-B32 gallery run (its pid is $1) to
# release the chip
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
date > /tmp/r4hw/START3

# 1. GB-scale measured row (rerun after the segment-copy OOM fix)
timeout 5400 python -u -m tpusparse.bench.scale --m 65536 --density 0.02 \
  --json BENCH_scale.json > /tmp/r4hw/scale_65536_b.log 2>&1
echo "scale_65536_b rc=$?" >> /tmp/r4hw/STATUS

# 2. dynamic-activation plan-floor study
timeout 3600 python -u scripts/dynamic_floor_study.py \
  --json data/dynamic_floor.json > /tmp/r4hw/dynfloor_b.log 2>&1
echo "dynfloor_b rc=$?" >> /tmp/r4hw/STATUS

# 3. remaining gallery re-measures, cheap/valuable first
for spec in "mesh2d-96 1 5" "stencil2d-64 1 5" \
            "stencil2d-64 8 5" "stencil2d-64 32 5" "aniso2d-eps100 1 5" \
            "stencil3d-7pt-48 1 5" "stencil3d-27pt-32 1 5" \
            "rmat-s12-sym 1 5" "blockpruned-4096 8 5" "mesh2d-96 8 5" \
            "rmat-s13-ef16 1 3"; do
  set -- $spec
  timeout 3000 python -u -m tpusparse.cli gallery --workloads "$1" \
    --batch "$2" --trials "$3" --json BENCH_gallery.json \
    > "/tmp/r4hw/gal3_$1_B$2.log" 2>&1
  echo "gal3_$1_B$2 rc=$?" >> /tmp/r4hw/STATUS
done
date > /tmp/r4hw/DONE3
