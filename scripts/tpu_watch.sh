#!/usr/bin/env bash
# Watch for the TPU tunnel to come back, then run the perf campaign once.
# The axon backend can hang indefinitely during init when the relay is
# down, so every probe runs in a time-bounded subprocess.
set -u
cd "$(dirname "$0")/.."
PROBE='
import jax, time
t = time.time()
d = jax.devices()
import jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
(x @ x).block_until_ready()
print("TPU_OK", d, "connect_s", round(time.time() - t, 1), flush=True)
'
while true; do
    if timeout 240 python -c "$PROBE" 2>/tmp/tpu_watch_err.log | grep -q TPU_OK; then
        echo "$(date +%H:%M:%S) tunnel up — starting campaign"
        bash scripts/perf_campaign.sh
        exit 0
    fi
    echo "$(date +%H:%M:%S) tunnel still down"
    sleep 240
done
