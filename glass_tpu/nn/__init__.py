from glass_tpu.nn.modules import (
    MLP,
    GraphNorm,
    GLASSConv,
    EmbZGConv,
    GLASS,
    TorchLinear,
)
from glass_tpu.nn.pretrain import MyGCNConv, EmbGConv, EdgeGNN
