#!/bin/bash
# Round-5 HEAD accuracy re-validation: 10 seeded repeats per synthetic,
# default (auto) layout, real TPU.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/glass_tpu_jax_cache
for ds in density cut_ratio coreness component; do
  timeout 5400 python -m glass_tpu.cli.glass_test --dataset $ds --use_one \
      --use_maxzeroone --repeat 10 > bench_logs/r5/head_${ds}_10rep.log 2>&1
  tail -1 bench_logs/r5/head_${ds}_10rep.log
done
echo "accuracy sweep complete"
