#!/bin/bash
# Poll the axon backend; when it initializes, run the staged TPU tasks.
cd /root/repo
for i in $(seq 1 48); do   # up to 4h
  if timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "TUNNEL BACK after $i polls $(date)"
    bash /root/repo/_tpu_followup.sh
    exit 0
  fi
  echo "poll $i: down $(date)"
  sleep 210
done
echo "TUNNEL STILL DOWN after 4h $(date)"
exit 7
