#!/bin/bash
# Poll until the axon TPU backend registers (outages hang device init for
# ~25 min before raising — probe with a hard timeout), then run the
# measurement batch + envelope campaign. Survives nothing across container
# resets: relaunch at round start with
#   nohup bash scripts/tpu_recovery_watch.sh > /tmp/tpu_watch.log 2>&1 &
cd /root/repo
while true; do
  timeout 300 python -c "
import jax
ds = jax.devices()
assert ds and ds[0].platform != 'cpu', ds
print('OK', ds)
" > /tmp/tpu_probe.out 2>&1
  if grep -q '^OK' /tmp/tpu_probe.out; then
    echo "UP $(date -u +%FT%TZ)" >> /tmp/tpu_status
    break
  fi
  echo "down $(date -u +%H:%M:%S)" >> /tmp/tpu_status
  sleep 120
done
nohup bash scripts/measure_batch.sh > /tmp/measure.out 2>&1 &
echo $! > /tmp/measure.pid
echo "measure batch launched pid $(cat /tmp/measure.pid)" >> /tmp/tpu_status
