#!/bin/bash
# Real-scale dress rehearsal of the real-world pipeline (VERDICT r2 item 5).
#
# The reference's real datasets are absent from the snapshot, so this runs
# the FULL two-stage recipe (README.md:24-66) on generated stand-ins at the
# real datasets' exact scale (tools/make_realworld_standin.py), with the
# *real* converted reference embedding tables as --use_nodeid init where
# the snapshot bundles them (hpo_metab / hpo_neuro, 14,587 x 64). When the
# actual SubGNN download is available, point --data_root at it — nothing
# else changes.
#
# Usage: bash tools/dress_rehearsal.sh [data_root] [repeats]
set -e
cd "$(dirname "$0")/.."
OUT=${1:-/root/standin_data}
REP=${2:-3}
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/glass_tpu_jax_cache}

[ -d "$OUT/dataset/hpo_metab" ] || python tools/make_realworld_standin.py --out "$OUT"

# stage 0: convert the bundled REAL reference tables (.pt -> .npz contract)
for t in hpo_metab hpo_neuro; do
  [ -f "Emb/${t}_64.npz" ] || python tools/convert_emb.py \
      "/root/reference/Emb/${t}_64.pt" Emb/
done

echo "=== hpo_metab: fine-tune from the REAL reference table (gcn, h64, bs59)"
python -m glass_tpu.cli.glass_test --dataset hpo_metab --use_nodeid \
    --use_maxzeroone --use_seed --repeat "$REP" --data_root "$OUT" \
    --report_auroc

echo "=== hpo_neuro: multilabel 10-class, REAL table init (gcn, h64, bs99)"
python -m glass_tpu.cli.glass_test --dataset hpo_neuro --use_nodeid \
    --use_maxzeroone --use_seed --repeat "$REP" --data_root "$OUT" \
    --report_auroc

echo "=== ppi_bp: SSL pretrain (GNNEmb recipe) -> fine-tune"
python -m glass_tpu.cli.gnn_emb --dataset ppi_bp --data_root "$OUT" \
    --optruns 2 --max_epochs 20
python -m glass_tpu.cli.glass_test --dataset ppi_bp --use_nodeid \
    --use_maxzeroone --use_seed --repeat "$REP" --data_root "$OUT" \
    --report_auroc

echo "=== em_user: SSL pretrain -> fine-tune (57k nodes / ~4.6M directed edges)"
python -m glass_tpu.cli.gnn_emb --dataset em_user --data_root "$OUT" \
    --optruns 1 --max_epochs 10
python -m glass_tpu.cli.glass_test --dataset em_user --use_nodeid \
    --use_maxzeroone --use_seed --repeat "$REP" --data_root "$OUT" \
    --report_auroc
echo "=== dress rehearsal complete"
