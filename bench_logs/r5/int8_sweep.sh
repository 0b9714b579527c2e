#!/bin/bash
# Round-5 int8 accuracy sweep (VERDICT r4 item 3): make the "quantization
# costs no accuracy" claim statistical — 10 paired repeats per dtype on
# (a) coreness / band layout and (b) an hpo-scale hardness-0.7 stand-in /
# dense_q layout, same seed set (repeats are internally seeded 0..9).
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/glass_tpu_jax_cache
mkdir -p bench_logs/r5

# Leg A: coreness, band layout
timeout 5400 python -m glass_tpu.cli.glass_test --dataset coreness --use_one \
    --use_maxzeroone --repeat 10 --sparse_layout band --dense_dtype int8 \
    > bench_logs/r5/coreness_band_int8_10rep.log 2>&1
timeout 5400 python -m glass_tpu.cli.glass_test --dataset coreness --use_one \
    --use_maxzeroone --repeat 10 --sparse_layout band --dense_dtype f32 \
    > bench_logs/r5/coreness_band_f32_10rep.log 2>&1

# Leg B: hpo_metab hardness-0.7 stand-in, dense_q layout (real table init)
[ -d /root/standin_hard/dataset/hpo_metab ] || \
    timeout 1800 python tools/make_realworld_standin.py --out /root/standin_hard \
        --hardness 0.7 --datasets hpo_metab
[ -f Emb/hpo_metab_64.npz ] || \
    timeout 600 python tools/convert_emb.py /root/reference/Emb/hpo_metab_64.pt Emb/
timeout 7200 python -m glass_tpu.cli.glass_test --dataset hpo_metab --use_nodeid \
    --use_maxzeroone --repeat 10 --data_root /root/standin_hard \
    --dense_dtype int8 > bench_logs/r5/hpo_metab_dense_int8_10rep.log 2>&1
timeout 7200 python -m glass_tpu.cli.glass_test --dataset hpo_metab --use_nodeid \
    --use_maxzeroone --repeat 10 --data_root /root/standin_hard \
    --dense_dtype f32 > bench_logs/r5/hpo_metab_dense_f32_10rep.log 2>&1
echo "int8 sweep complete"
