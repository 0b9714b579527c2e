"""Convert reference pretrained embedding tables (torch .pt) to the npz
contract this framework loads through --use_nodeid.

The reference ships ``Emb/{dataset}_64.pt`` torch tensors
(GNNEmb.py:186-188); glass_tpu reads ``{dataset}_64.npz`` with key
'embedding' (cli/glass_test.py::load_pretrained_table).

Usage: python tools/convert_emb.py /path/Emb/hpo_metab_64.pt out_dir/
"""

import sys
from pathlib import Path

import numpy as np


def convert(pt_path: str, out_dir: str) -> Path:
    import torch

    t = torch.load(pt_path, map_location="cpu")
    if hasattr(t, "detach"):
        t = t.detach().numpy()
    arr = np.asarray(t, dtype=np.float32)
    out = Path(out_dir) / (Path(pt_path).stem + ".npz")
    out.parent.mkdir(parents=True, exist_ok=True)
    np.savez(out, embedding=arr)
    print(f"{pt_path} ({arr.shape}) -> {out}")
    return out


if __name__ == "__main__":
    convert(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else "Emb")
