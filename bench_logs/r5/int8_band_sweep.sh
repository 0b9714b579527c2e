#!/bin/bash
# Corrected: TRUE band-kernel coreness sweep (--spmm pallas makes
# --sparse_layout band effective; without it the planner's dense path ran).
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/glass_tpu_jax_cache
timeout 5400 python -m glass_tpu.cli.glass_test --dataset coreness --use_one \
    --use_maxzeroone --repeat 10 --spmm pallas --sparse_layout band \
    --dense_dtype int8 > bench_logs/r5/coreness_trueband_int8_10rep.log 2>&1
timeout 5400 python -m glass_tpu.cli.glass_test --dataset coreness --use_one \
    --use_maxzeroone --repeat 10 --spmm pallas --sparse_layout band \
    --dense_dtype f32 > bench_logs/r5/coreness_trueband_f32_10rep.log 2>&1
echo done
