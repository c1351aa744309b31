#!/bin/bash
# Round-5 TPU study queue: waits for the running anatomy study, then runs
# each study sequentially (ONE TPU client at a time — axon tunnel).
cd /root/repo
while pgrep -f "r4_dinov2_anatomy" > /dev/null 2>&1; do sleep 30; done
python experiments/r5_swin_fused.py   >> experiments/r5_swin_fused.log 2>&1
python experiments/r5_long_fused.py   >> experiments/r5_long_fused.log 2>&1
python experiments/r5_int8_serving.py >> experiments/r5_int8_serving.log 2>&1
python experiments/r5_input_path.py   >> experiments/r5_input_path.log 2>&1
python experiments/r5_b16_smalln.py   >> experiments/r5_b16_smalln.log 2>&1
echo "QUEUE DONE $(date)" >> experiments/r5_queue.log
