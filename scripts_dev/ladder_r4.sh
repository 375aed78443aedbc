#!/bin/bash
# Re-capture the r3 optimization ladder under the fixed r4 stack in ONE
# session with 5 repeat groups per arm (VERDICT r3 #3: ladder rows need
# effect size > group spread). Arms are cumulative-feature A/Bs of the
# shipped preset. Multiscale row off (it adds 2 recipe-size compiles and
# its own section); eval row runs once in the stock arm only.
set -u
cd "$(dirname "$0")/.."
export SPE_BENCH_REPEATS=5
export SPE_BENCH_MULTISCALE=0
for arm in "stock" "no_flat_tail_na" "layers0" "block0" "attn0"; do
  case $arm in
    stock)   env_args=() ;;
    layers0) env_args=(SPE_BENCH_FUSED_LAYERS=0) ;;
    block0)  env_args=(SPE_BENCH_FUSED_LAYERS=0 SPE_BENCH_FUSED_BLOCK=0) ;;
    attn0)   env_args=(SPE_BENCH_FUSED_LAYERS=0 SPE_BENCH_FUSED_BLOCK=0 SPE_BENCH_PALLAS_ATTN=0) ;;
    *) continue ;;
  esac
  echo "=== arm $arm (${env_args[*]:-none})"
  env "${env_args[@]}" timeout 2700 python bench.py 2>&1 | grep -v "WARNING\|E08"
done
