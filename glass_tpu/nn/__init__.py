from glass_tpu.nn.modules import (
    MLP,
    GraphNorm,
    GLASSConv,
    EmbZGConv,
    GLASS,
    TorchLinear,
    AttentionConv,
)
from glass_tpu.nn.pretrain import MyGCNConv, EmbGConv, EdgeGNN
from glass_tpu.nn.seg import GSegGNN, DenseGCNConv, DenseGINConv, MaskedGraphNorm
