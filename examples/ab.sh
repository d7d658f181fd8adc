#!/bin/bash
# Herald A/B ladder (reference examples/ctr/tests/run.sh analog):
# identical flags across the four modes the reference compares —
#   baseline      (run_hetu analog: pull everything every step)
#   assign-only   (affinity placement, no cache: isolates scheduling)
#   scheduled     (run_laia analog: lookahead planner + hot-row cache)
#   fae           (run_laia_fae analog: hot/cold split baseline)
# then the planner-counter traffic A/B and the compiled-HLO mesh A/B.
#
#   bash examples/ab.sh [extra launch flags...]
set -e
cd "$(dirname "$0")/.."
BASE="--comm hybrid --nepoch 1 --batch-size 256 \
      --embedding-size 128 --cache-limit-ratio 0.1 $*"
FLAGS="--model wdl_criteo $BASE"
echo "== baseline (run_hetu analog) ==" | tee ab_baseline.log
python examples/run_baseline.py $FLAGS 2>&1 | tee -a ab_baseline.log
echo "== assign-only (scheduling without the cache) ==" | tee ab_assigned.log
python -m herald_tpu.launch --assign-only $FLAGS 2>&1 | tee -a ab_assigned.log
echo "== scheduled (run_laia analog) ==" | tee ab_scheduled.log
python examples/run_scheduled.py $FLAGS 2>&1 | tee -a ab_scheduled.log
echo "== fae (run_laia_fae analog) ==" | tee ab_fae.log
python -m herald_tpu.launch --model fae_wdl_criteo --fae $BASE \
    2>&1 | tee -a ab_fae.log
echo "== exchange traffic A/B (planner counters) =="
python benchmarks/traffic_ab.py
echo "== compiled-HLO byte A/B (8-device mesh) =="
python benchmarks/mesh_ab.py --pinned-rows 1024 --bytes-only
