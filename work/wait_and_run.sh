#!/usr/bin/env bash
# Poll the TPU tunnel; when it answers, run the round-4 measurement battery.
cd /root/repo
while true; do
  if timeout -k 15 600 python -c "
import jax, jax.numpy as jnp
d = jax.devices()
print('TPU_OK', d, float(jnp.ones((8,8), jnp.bfloat16).sum()), flush=True)
" 2>/dev/null | grep -q TPU_OK; then
    echo "$(date +%H:%M:%S) TPU BACK UP — starting battery"
    break
  fi
  echo "$(date +%H:%M:%S) tpu still down"
  sleep 120
done
bash work/r4_runner.sh
