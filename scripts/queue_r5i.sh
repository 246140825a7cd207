#!/bin/bash
# Round-5 serial TPU queue (health-probe before each drive; the remote
# worker can crash and take tens of minutes to return — see CLAUDE.md).
# Usage: bash scripts/queue_r5i.sh >> /tmp/queue_r5i.log 2>&1 &
cd /root/repo

probe() {
  for i in $(seq 1 60); do
    if timeout 90 python -c "import jax, jax.numpy as jnp; x=jnp.ones((256,256)); print('probe ok', float((x@x).sum()))" 2>/dev/null | grep -q "probe ok"; then
      echo "TPU healthy at $(date -u)"; return 0
    fi
    sleep 45
  done
  echo "TPU did not recover"; return 1
}

probe || exit 1
echo "=== infer-ops-fused ==="
timeout 3000 stdbuf -oL python scripts/drive_infer_ops_r5.py 2>&1 | stdbuf -oL grep -v WARNING

probe || exit 1
echo "=== dnerf-row-12000 ==="
NGP_STEPS=12000 timeout 6000 stdbuf -oL python scripts/drive_dnerf.py 2>&1 | stdbuf -oL grep -v WARNING

echo "=== queue done $(date -u) ==="
