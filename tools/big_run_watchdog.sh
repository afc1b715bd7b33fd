#!/bin/bash
# big_run 23M watchdog v3.  Primary health signal: LOG PROGRESS (the
# flushed-row number or any non-ticker line), because the worker can
# refuse NEW connections while the run's established stream is healthy
# (v2's probe-only check killed a working run at 66%).  The probe only
# confirms an outage after the log has been stale for 2 checks.
LOG=/root/repo/records/big_run_23M_r5.log
export MASA_TPU_STAGE2_TRACE=1   # per-hop lines: stage-2 liveness + the per-hop record
probe() {
  timeout 150 env PYTHONPATH=/root/repo:/root/.axon_site python -c "
import jax, numpy as np
x = jax.numpy.ones((256,256), jax.numpy.int32)
print(int(np.asarray((x+x)[0,0])))
" >/dev/null 2>&1
}
sig() {  # (last flushed-row number, count of non-ticker lines)
  local row lines
  row=$(grep -o 'flushed row [0-9]*' "$LOG" | tail -1)
  lines=$(grep -vc 'flushed row' "$LOG")
  echo "$row/$lines"
}
for attempt in $(seq 1 12); do
  [ -f /tmp/masa_stop_chains ] && { echo "[watchdog] stop sentinel" >> $LOG; exit 0; }
  for i in $(seq 1 90); do
    probe && break
    echo "[watchdog] device dead, probe $i ($(date -u +%H:%M:%S))" >> $LOG
    sleep 120
  done
  echo "[watchdog] attempt $attempt starting ($(date -u +%H:%M:%S))" >> $LOG
  PYTHONPATH=/root/repo:/root/.axon_site python /root/repo/tools/big_run.py 23M >> $LOG 2>&1 &
  PID=$!
  stale=0
  last=$(sig)
  while kill -0 $PID 2>/dev/null; do
    sleep 180
    cur=$(sig)
    if [ "$cur" != "$last" ]; then
      last=$cur; stale=0; continue
    fi
    # log stale for 180s+: suspicious, confirm with the probe
    if probe; then
      stale=$((stale+1))   # device up but no progress (degraded or wedged stream)
      echo "[watchdog] stale log, probe OK ($stale) ($(date -u +%H:%M:%S))" >> $LOG
      [ $stale -ge 4 ] && { echo "[watchdog] wedged 12+ min: killing $PID for resume" >> $LOG; kill $PID; sleep 3; kill -9 $PID 2>/dev/null; break; }
    else
      stale=$((stale+2))
      echo "[watchdog] stale log, probe FAIL ($stale) ($(date -u +%H:%M:%S))" >> $LOG
      [ $stale -ge 4 ] && { echo "[watchdog] outage: killing $PID for resume" >> $LOG; kill $PID; sleep 3; kill -9 $PID 2>/dev/null; break; }
    fi
  done
  wait $PID 2>/dev/null
  grep -q '"full_alignment_s"' $LOG && { echo "[watchdog] done" >> $LOG; exit 0; }
done
echo "[watchdog] gave up after 12 attempts" >> $LOG
exit 1
