#!/bin/bash
# Round-4 chip session: waits for the axon tunnel to respond, then runs
# the queued measurements in stages (smallest compiles first), logging to
# /tmp/chip_r4.log. Each stage is bounded by `timeout` so one wedge
# cannot eat the session.
cd /root/repo
LOG=/tmp/chip_r4.log
echo "=== chip session start $(date) ===" >> $LOG

# stage 0: wait for the tunnel (probe every 5 min, up to 4 h)
for i in $(seq 1 48); do
  if timeout 120 python -c "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.ones((8,8)))))" >> $LOG 2>&1; then
    echo "tunnel up after probe $i $(date)" >> $LOG
    break
  fi
  echo "probe $i: tunnel down $(date)" >> $LOG
  sleep 240
done

set -x
# stage 1: engine train at B=128 only, no native comparison (one compile)
timeout 3600 python scripts/bench_engine_train.py --batches 128 --skip-native \
  >> $LOG 2>&1
# stage 2: B=128 native comparison + B=512
timeout 3600 python scripts/bench_engine_train.py --batches 128,512 \
  >> $LOG 2>&1
# stage 3: B=1024
timeout 3600 python scripts/bench_engine_train.py --batches 1024 \
  >> $LOG 2>&1
# stage 4: gallery eval count vs sort at 20k x 4096
timeout 3600 python scripts/bench_gallery_eval.py >> $LOG 2>&1
# stage 5: LSTM ledger variants at trajectory dims
timeout 3600 python scripts/bench_lstm_train.py --batches 256,1024 \
  --variants base,unroll2,unroll4,bf16rec >> $LOG 2>&1
# stage 6: serving f32 vs int8
timeout 3600 python scripts/bench_serving.py --quantize int8 >> $LOG 2>&1
echo "=== chip session done $(date) ===" >> $LOG
