#!/bin/bash
# Round-5 capstone: the composite disk->decode->prefetch->device path
# driven through the PUBLIC CLI on the real chip (VERDICT r4 #1's
# "run learn_image_embeddings resnet-50@224 through the real
# data/files.py path"), on the generated NAB-format on-disk JPEG fixture.
#
# Usage: bash tools/capstone_r5.sh [OUTDIR]   (default artifacts/r5)
set -euo pipefail
cd "$(dirname "$0")/.."
OUT=${1:-artifacts/r5}
mkdir -p "$OUT"

FIXTURE=$(python - <<'EOF'
import importlib, sys
sys.path.append('.')
bip = importlib.import_module('tools.bench_input_pipeline')
print(bip.make_fixture(1280, 128))
EOF
)
echo "fixture: $FIXTURE"

python compute_class_embedding.py \
  --hierarchy /root/reference/Cifar-Hierarchy/cifar.parent-child.txt \
  --out "$OUT/capstone_embedding.pickle" | tee "$OUT/composite_cli_embed.txt"

python learn_image_embeddings.py \
  --dataset nab --data_root "$FIXTURE" \
  --embedding "$OUT/capstone_embedding.pickle" \
  --architecture resnet-50 --batch_size 128 --loss inv_corr \
  --cls_weight 0.1 --bf16 \
  --lr_schedule SGD --sgd_schedule 1:0.1,3 --epochs 3 \
  --read_workers 8 --queue_size 4 --no_progress \
  --log_dir "$OUT/composite_cli_logs" \
  --feature_dump "$OUT/composite_cli_features.pickle" \
  2>&1 | tee "$OUT/composite_cli_train.txt"

echo "capstone r5 done: $OUT"
