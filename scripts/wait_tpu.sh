#!/bin/bash
# Poll until the axon TPU tunnel is back (init succeeds), then run "$@".
while true; do
  if timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "TPU is back: $(date)"
    break
  fi
  echo "tunnel still down: $(date)"
  sleep 60
done
exec "$@"
