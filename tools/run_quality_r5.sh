#!/bin/bash
# Round-5 quality-grid driver: train the 19M draft + 125M target on the real
# chip, then GPTQ-quantize the 125M at every supported bit-width (VERDICT
# round-4 items #1/#3/#5). Evaluation runs separately (fast, interactive).
set -e
cd /root/repo
echo "=== 19M pretrain (draft model) $(date) ==="
python -m tools.quality_pipeline --steps pretrain --model-size 19M --iters 1500
echo "=== 125M pretrain (target model) $(date) ==="
python -m tools.quality_pipeline --steps pretrain --model-size 125M \
    --iters 3000 --lr 4e-4 --remat
echo "=== 125M GPTQ grid $(date) ==="
python -m tools.quality_pipeline --steps gptq --model-size 125M --iters 3000
echo "=== done $(date) ==="
