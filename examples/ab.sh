#!/bin/bash
# Herald A/B harness (reference examples/ctr/tests/run.sh analog):
# run the baseline engine and the scheduled (Herald) engine with identical
# flags and log both reports, then the exchange-traffic A/B.
#
#   bash examples/ab.sh [extra launch flags...]
set -e
cd "$(dirname "$0")/.."
FLAGS="--model wdl_criteo --comm hybrid --nepoch 1 --batch-size 256 \
       --embedding-size 128 --cache-limit-ratio 0.1 $*"
echo "== baseline (run_hetu analog) ==" | tee ab_baseline.log
python examples/run_baseline.py $FLAGS 2>&1 | tee -a ab_baseline.log
echo "== scheduled (run_laia analog) ==" | tee ab_scheduled.log
python examples/run_scheduled.py $FLAGS 2>&1 | tee -a ab_scheduled.log
echo "== exchange traffic A/B =="
python benchmarks/traffic_ab.py
