#!/bin/bash
# One-shot TPU measurement sweep: everything PERF.md + BENCH need, logged
# to perf_logs/. Run whenever the axon tunnel is healthy.
set -u
cd "$(dirname "$0")/.."
mkdir -p perf_logs
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
ts=$(date +%H%M%S)

run() {
  name=$1; shift
  echo "=== $name ($(date +%T)) ==="
  timeout 900 "$@" 2>&1 | tee "perf_logs/${name}_${ts}.log" | tail -25
}

run bench        python bench.py
run fwd_marg_wc  python tools/profile_marginal.py --workload watercube
run fwd_marg_het python tools/profile_marginal.py --workload hetero
run grad_marg_wc python tools/profile_grad_marginal.py
run grad_marg_het python tools/profile_grad_marginal.py --workload hetero
run ct_grad      python tools/profile_ct_grad.py
run superp_micro python tools/superp_micro.py
run oblique_3015 python tools/oblique_micro.py 30 15
run oblique_4545 python tools/oblique_micro.py 45 45
run adjoints     python tools/validate_pallas_adjoints.py
echo "sweep done $(date +%T)"
