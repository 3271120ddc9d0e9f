#!/bin/bash
# Round-5 serialized TPU work queue (ONE process holds the chip at a time).
# Logs to /tmp/r5q/*.log; safe to re-run (skips via marker files).
cd /root/repo
Q=/tmp/r5q
mkdir -p $Q
probe() {
  timeout 240 python -c "import jax; jax.devices()" >/dev/null 2>&1
}
step() {  # step <name> <timeout_s> <cmd...>
  local name=$1; shift
  local to=$1; shift
  [ -f $Q/$name.done ] && { echo "skip $name (done)"; return 0; }
  if ! probe; then echo "$(date +%T) tunnel DOWN before $name"; return 1; fi
  echo "$(date +%T) start $name"
  timeout "$to" "$@" > $Q/$name.log 2>&1
  local rc=$?
  echo "rc=$rc" >> $Q/$name.log
  echo "$(date +%T) end $name rc=$rc"
  [ $rc -eq 0 ] && touch $Q/$name.done
  # Grant release wait only needed when the step was killed (clean exits
  # release the chip promptly).
  [ $rc -ne 0 ] && sleep 150
  return 0
}
step bigmsm_v3   3600 python tools/bench_micro.py bigmsm 12
step bigntt_dev  2400 python tools/bench_micro.py bigntt 14
step ck_a        1800 python tools/probe_cache_key.py 10
step ck_b        1800 python tools/probe_cache_key.py 10
PLONK_TPU_BN254_NTT=pallas PLONK_TPU_BIGMSM_KERNEL=v3 \
  step prover_new 5400 python tools/probe_bn254_prover_new.py 12
step p2e20       7200 python tools/probe_2e20.py 20
echo "QUEUE COMPLETE $(date +%T)"
