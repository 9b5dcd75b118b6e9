#!/bin/bash
# Round-3 on-chip campaign. Run when the axon tunnel is up; every step is
# independently timed out and failures don't stop the sequence. Produces:
#   data/tpu_test_run_r3.txt      TPU test-run evidence (VERDICT r2 #6)
#   data/campaign_seed7b.json     7B quant build + first numbers (#2)
#   data/campaign_bench.json      full bench capture (#1)
#   data/tune_realistic.json      W/N/G sweep at mid-band compression (#4)
#   data/campaign_serving.json    serving objectives bench (#5)
set -u
cd /root/repo
mkdir -p data
LOG=data/tpu_campaign_r3.log
exec >>"$LOG" 2>&1
echo "=== campaign start $(date -u +%FT%TZ) ==="

run() {  # run <name> <timeout-s> <cmd...>
  # markers go to STDERR: several steps redirect stdout into JSON artifacts
  local name=$1 to=$2; shift 2
  echo "--- [$name] start $(date -u +%FT%TZ)" >&2
  timeout "$to" "$@"
  echo "--- [$name] rc=$? $(date -u +%FT%TZ)" >&2
}

probe() {  # tunnel up? (the call HANGS when down, hence the hard timeout)
  timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1
}

bail_if_down() {  # tunnel died: unlock so the poller relaunches us later
  if ! probe; then
    echo "=== tunnel down at $1; unlocking and exiting $(date -u +%FT%TZ) ===" >&2
    rm -f /tmp/campaign_r3.lock
    exit 1
  fi
}

bail_if_down start

# 1. TPU test pass for the headline kernel paths (rolled mask included:
#    compiled Mosaic, the path interpret-mode CI can only emulate)
run tpu-kernel-tests 2400 env LADE_TEST_TPU=1 python -m pytest \
    tests/test_lookahead_attention.py -q --tb=short -p no:cacheprovider \
    2>&1 | tee data/tpu_test_run_r3.txt
run tpu-e2e-tests 2400 env LADE_TEST_TPU=1 python -m pytest \
    tests/test_e2e_greedy.py -q --tb=short -p no:cacheprovider \
    2>&1 | tee -a data/tpu_test_run_r3.txt

bail_if_down "after tests"

# 2. 7B quant graphs: seed cache + first numbers
run seed-7b 5400 python scripts/seed_7b_cache.py int4 int8 \
    > data/campaign_seed7b.json

bail_if_down "after seed-7b"

# 3. full bench (captures headline + all variants, seeds everything)
run bench 4200 env LADE_BENCH_BUDGET_S=3300 LADE_BENCH_BACKEND_WAIT_S=600 \
    python bench.py > data/campaign_bench.json

bail_if_down "after bench"

# 4. realistic-compression W/N/G sweep
run tune-realistic 4200 python scripts/tune_realistic.py --grid small \
    --budget-s 3600

# 5. serving objectives
run serving 2400 python scripts/serving_bench.py --batch-group 2 \
    > data/campaign_serving.json

echo "=== campaign done $(date -u +%FT%TZ) ==="
