#!/bin/bash
# Round-4 hardware runs, phase 2: re-measure the <=0.7-roofline gallery
# rows whose kernels changed in r4 (Pallas DIA kernel; rsell
# chunks-per-step default 128 -> 256), with trials for spread.
# Launch AFTER r4_hw_runs.sh completes. Logs to /tmp/r4hw/.
mkdir -p /tmp/r4hw
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
# wait for phase 1 (r4_hw_runs.sh) to release the chip
while [ ! -f /tmp/r4hw/DONE ]; do sleep 30; done
date > /tmp/r4hw/START2

# scale 65536^2 rerun after the rsell segment-slice OOM fix
timeout 5400 python -u -m tpusparse.bench.scale --m 65536 --density 0.02 \
  --json BENCH_scale.json > /tmp/r4hw/scale_65536_b.log 2>&1
echo "scale_65536_b rc=$?" >> /tmp/r4hw/STATUS

# dynamic-floor study rerun with the repo on sys.path
timeout 3600 python -u scripts/dynamic_floor_study.py \
  --json data/dynamic_floor.json > /tmp/r4hw/dynfloor_b.log 2>&1
echo "dynfloor_b rc=$?" >> /tmp/r4hw/STATUS
# Re-measure only rows whose kernels changed in r4 (Pallas DIA; rsell
# chunks-per-step 256) or that the floor model cannot yet explain
# (mesh2d-96 B=8); rows already sitting at a computed floor keep their
# r3 numbers with the per-row law citation (scripts/gallery_floors.py).
for spec in "aniso2d-eps100 1 5" "stencil3d-7pt-48 1 5" \
            "stencil3d-27pt-32 1 5" "rmat-s12-sym 1 5" \
            "rmat-s13-ef16 1 3" "mesh2d-96 8 5"; do
  set -- $spec
  timeout 2400 python -u -m tpusparse.cli gallery --workloads "$1" \
    --batch "$2" --trials "$3" --json BENCH_gallery.json \
    > "/tmp/r4hw/gal2_$1_B$2.log" 2>&1
  echo "gal2_$1_B$2 rc=$?" >> /tmp/r4hw/STATUS
done
date > /tmp/r4hw/DONE2
