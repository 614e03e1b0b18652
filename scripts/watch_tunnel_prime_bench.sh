#!/bin/bash
# Round-4 session helper: wait for the axon tunnel to come back, then run
# bench.py ONCE to prime the persistent compile cache with the current
# program (bench's jitted scan changed this round — typed rbg keys — so
# the cached executable from earlier rounds no longer matches). Without a
# warm cache the driver's round-end bench run would spend 3-10 min in a
# remote compile against a 540 s watchdog.
#
# Logs to /tmp/prime_bench.log. Probes every 5 min for up to ~8 h.
cd /root/repo
LOG=/tmp/prime_bench.log
echo "=== watcher start $(date) ===" >> $LOG
for i in $(seq 1 96); do
  if timeout 180 python -c "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.ones((8,8)))))" >> $LOG 2>&1; then
    echo "tunnel up after probe $i $(date)" >> $LOG
    # generous watchdog for the one cold compile
    VVTPU_BENCH_TIMEOUT=2400 timeout 2500 python bench.py >> $LOG 2>&1
    rc=$?
    echo "bench prime rc=$rc $(date)" >> $LOG
    if [ $rc -eq 0 ]; then
      # verify the cache is warm: a second run must be fast
      VVTPU_BENCH_TIMEOUT=540 timeout 600 python bench.py >> $LOG 2>&1
      echo "bench warm rc=$? $(date)" >> $LOG
      break
    fi
  else
    echo "probe $i: tunnel down $(date)" >> $LOG
  fi
  sleep 240
done
echo "=== watcher done $(date) ===" >> $LOG
