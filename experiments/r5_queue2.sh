#!/bin/bash
# Round-5 follow-on TPU queue: waits for the first queue (by PID), then
# runs the swin compile bisect and the missing proto_ce_ibot anatomy row.
cd /root/repo
Q1_PID="$1"
while kill -0 "$Q1_PID" 2>/dev/null; do sleep 30; done
python experiments/r5_swin_bisect.py >> experiments/r5_swin_bisect.log 2>&1
python experiments/r4_dinov2_anatomy.py proto_ce_ibot >> experiments/r5_anatomy_rerun.log 2>&1
echo "QUEUE2 DONE $(date)" >> experiments/r5_queue.log
