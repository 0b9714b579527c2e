#!/usr/bin/env bash
# Runbook: fetch the real-world SubGNN datasets the reference trains on
# (reference README.md:24-41) and verify the drop-in layout glass_tpu's
# loaders expect (glass_tpu/data/loaders.py::load_real).
#
# This environment has no network egress, so this script documents the
# procedure and VERIFIES a download rather than performing one. Run it
# with the target directory after downloading on a connected machine:
#
#   ./tools/fetch_realworld.sh /path/to/downloaded/root
#
# Download sources (from the reference README):
#   primary: https://www.dropbox.com/sh/zv7gw2bqzqev9yn/AACR9iR4Ok7f9x1fIAiVCdj3a?dl=0
#   mirror:  https://disk.pku.edu.cn/#/link/B85C0589ADE44E0CFF8AAD6A4D6BF6B0
#   (the same files ship with SubGNN: https://github.com/mims-harvard/SubGNN)
#
# Expected layout after unzipping into <root>/dataset/:
#   <root>/dataset/{ppi_bp,hpo_metab,hpo_neuro,em_user}/
#       subgraphs.pth   TSV: nodes '-'-joined \t label \t train/val/test
#       edge_list.txt   one "src dst" pair per line
#
# Then point the framework at it:
#   export GLASS_DATA_ROOT=<root>
#   python -m pytest tests/test_realdata_integration.py -v   # drop-in gate
#   python -m glass_tpu.cli.glass_test --dataset ppi_bp --use_nodeid \
#       --use_maxzeroone --use_seed --repeat 10
set -euo pipefail

ROOT="${1:-.}"
DATASETS=(ppi_bp hpo_metab hpo_neuro em_user)
# Known-good stats (SubGNN paper; hpo node count independently pinned by
# the reference's Emb/hpo_metab_64.pt table shape): name nodes subgraphs
declare -A NODES=([ppi_bp]=17080 [hpo_metab]=14587 [hpo_neuro]=14587 [em_user]=57333)
declare -A SUBS=([ppi_bp]=1591 [hpo_metab]=2400 [hpo_neuro]=4000 [em_user]=324)

fail=0
for d in "${DATASETS[@]}"; do
  dir="$ROOT/dataset/$d"
  if [[ ! -f "$dir/subgraphs.pth" || ! -f "$dir/edge_list.txt" ]]; then
    echo "MISSING  $dir/{subgraphs.pth,edge_list.txt} — download per the header comments"
    fail=1
    continue
  fi
  nsub=$(wc -l < "$dir/subgraphs.pth")
  nmax=$(awk '{ if ($1>m) m=$1; if ($2>m) m=$2 } END { print m+1 }' "$dir/edge_list.txt")
  echo "FOUND    $d: $nsub subgraph rows (expect ${SUBS[$d]}), max node id+1 = $nmax (expect <= ${NODES[$d]})"
  # record checksums so future fetches can be compared against a known-good
  # download (the upstream files carry no published hashes)
  sha256sum "$dir/subgraphs.pth" "$dir/edge_list.txt"
done

if [[ $fail -eq 0 ]]; then
  echo
  echo "All four datasets present. Verify drop-in compatibility with:"
  echo "  GLASS_DATA_ROOT=$ROOT python -m pytest tests/test_realdata_integration.py -v"
fi
exit $fail
