#!/bin/sh
# Round-4 capstone: drive the full three-stage pipeline end-to-end on the
# real TPU with the current code, through the public CLIs only.
# Artifacts land in artifacts/r4/.
#
#   embedding (golden-checked) -> 36-epoch SGDR train (synthetic-100,
#   resnet-110-wfc, bf16, batch 256; warm restart at epoch 12) ->
#   feature dump -> evaluate_retrieval (mAHP/AP) ->
#   evaluate_classification_accuracy (centroid mode) ->
#   export_model (StableHLO) -> export_keras_weights -> re-import circle.
set -e
cd "$(dirname "$0")/.."
OUT=artifacts/r4
mkdir -p $OUT
W=/tmp/capstone_r4
rm -rf $W && mkdir -p $W

echo "== 1. class embedding (golden check) =="
python compute_class_embedding.py \
    --hierarchy /root/reference/Cifar-Hierarchy/cifar.parent-child.txt \
    --out $W/embedding.pickle | tee $OUT/capstone_embedding.txt
python - <<'EOF'
import pickle, numpy as np
a = pickle.load(open("/tmp/capstone_r4/embedding.pickle", "rb"))
b = pickle.load(open("/root/reference/embeddings/cifar100.unitsphere.pickle", "rb"))
d = np.abs(a["embedding"] - b["embedding"]).max()
print(f"golden max delta: {d:.2e}")
assert d < 1e-12
EOF

echo "== 2. train (36-epoch SGDR, restart at 12) =="
python learn_image_embeddings.py \
    --dataset synthetic-100-50000-10000 --data_root x \
    --embedding $W/embedding.pickle --architecture resnet-110-wfc \
    --loss inv_corr --cls_weight 0.1 \
    --lr_schedule SGDR --sgdr_max_lr 0.5 --max_decay 0.1 \
    --batch_size 256 --bf16 --epochs 36 --seed 11 --no_progress \
    --log_dir $W/logs --snapshot $W/snap.ckpt \
    --model_dump $W/model.ckpt --feature_dump $W/features.pickle
cp $W/logs/metrics.jsonl $OUT/capstone_metrics.jsonl

echo "== 3. retrieval eval =="
python evaluate_retrieval.py \
    --dataset synthetic-100-50000-10000 --data_root x \
    --hierarchy /root/reference/Cifar-Hierarchy/cifar.parent-child.txt \
    --feat $W/features.pickle --label capstone --clip_ahp 250 --plot_max 0 \
    | tee $OUT/capstone_retrieval.txt

echo "== 4. classification eval (centroid mode) =="
python evaluate_classification_accuracy.py \
    --dataset synthetic-100-50000-10000 --data_root x \
    --hierarchy /root/reference/Cifar-Hierarchy/cifar.parent-child.txt \
    --architecture resnet-110-wfc \
    --model $W/model.ckpt --layer l2norm --centroids $W/embedding.pickle \
    --batch_size 250 \
    | tee $OUT/capstone_classification.txt

echo "== 5. StableHLO export + validation =="
python export_model.py \
    --checkpoint $W/model.ckpt --architecture resnet-110-wfc \
    --out $W/model.stablehlo --validate \
    | tee $OUT/capstone_export.txt

echo "== 6. Keras .h5 export -> re-import circle =="
python export_keras_weights.py \
    --model $W/model.ckpt --architecture resnet-110-wfc \
    --out $W/model.h5 | tee $OUT/capstone_h5.txt
python import_keras_weights.py \
    --h5 $W/model.h5 --architecture resnet-110-wfc \
    --embed_dim 100 --loss inv_corr --cls_classes 100 \
    --out $W/model_reimported.ckpt | tee -a $OUT/capstone_h5.txt
python - <<'EOF' | tee -a artifacts/r4/capstone_h5.txt
import numpy as np, jax
from semantic_embeddings_tpu.train.state import load_checkpoint_raw
a, _ = load_checkpoint_raw("/tmp/capstone_r4/model.ckpt")
b, _ = load_checkpoint_raw("/tmp/capstone_r4/model_reimported.ckpt")
la, lb = jax.tree.leaves(a["params"]), jax.tree.leaves(b["params"])
assert len(la) == len(lb) and la
deltas = [float(np.abs(np.asarray(x) - np.asarray(y)).max())
          for x, y in zip(la, lb)]
print(f"h5 circle: {len(deltas)} param leaves, max |delta| = {max(deltas):.3e}")
assert max(deltas) < 1e-5
EOF

echo "CAPSTONE OK"
