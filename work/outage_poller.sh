#!/bin/bash
# Round-4 end-of-round outage poller: probe the tunnel every 3 min; when the
# EXECUTE path answers (readback completes), fire the on-device battery.
# Disarm: kill $(cat /tmp/r4s_poller.pid)
while true; do
  timeout -k 15 300 python -u -c "
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
x = jnp.ones((128,128), jnp.bfloat16)
print('VAL', float(jax.jit(lambda a:(a@a).sum())(x)), flush=True)
" > /tmp/poll_probe.log 2>&1
  if grep -q "^VAL" /tmp/poll_probe.log; then
    date; echo "TUNNEL UP — firing battery"
    PIV_TPU_TESTS=1 timeout -k 15 3600 python -m pytest tests -m tpu -q > work/pytest_tpu_r4r.log 2>&1
    date; echo "R4S TPU TESTS DONE rc=$?"
    timeout -k 15 3600 python -u bench.py > work/bench_r4_final.txt 2>&1
    date; echo "R4S BENCH DONE rc=$?"
    break
  fi
  date; echo "tunnel still down"
  sleep 180
done
