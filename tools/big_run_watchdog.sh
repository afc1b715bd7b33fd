#!/bin/bash
# Run big_run 23M under a TPU-worker-outage watchdog.
#
# The tunneled worker restarts without warning (three outages in the
# first 90 min of 2026-08-20); an in-flight RPC then never returns and
# big_run stalls forever on a live-looking socket.  This wrapper probes
# the device from a SEPARATE process; on 3 consecutive probe failures
# it kills the run and relaunches it, and big_run resumes from the
# last flushed special row (the SRA checkpoint contract) with the
# honest-timing meta summing wall time over attempts.
# Probe timeout 150s and 3 consecutive fails required: on this 1-core
# host a concurrent CPU job can starve a probe's jax init (a 2-fail
# threshold once killed a healthy run).
LOG=/root/repo/records/big_run_23M_r5.log
probe() {
  timeout 150 env PYTHONPATH=/root/repo:/root/.axon_site python -c "
import jax, numpy as np
x = jax.numpy.ones((256,256), jax.numpy.int32)
print(int(np.asarray((x+x)[0,0])))
" >/dev/null 2>&1
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
  fails=0
  while kill -0 $PID 2>/dev/null; do
    sleep 120
    if probe; then
      fails=0
    else
      fails=$((fails+1))
      echo "[watchdog] probe fail $fails ($(date -u +%H:%M:%S))" >> $LOG
      if [ $fails -ge 3 ]; then
        echo "[watchdog] worker outage: killing $PID for resume" >> $LOG
        kill $PID 2>/dev/null; sleep 3; kill -9 $PID 2>/dev/null
        break
      fi
    fi
  done
  wait $PID 2>/dev/null
  grep -q '"full_alignment_s"' $LOG && { echo "[watchdog] done" >> $LOG; exit 0; }
done
echo "[watchdog] gave up after 12 attempts" >> $LOG
exit 1
