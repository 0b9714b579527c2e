from glass_tpu.data.basegraph import BaseGraphData
from glass_tpu.data.loaders import load_dataset, SYNTHETIC_DATASETS, REAL_DATASETS
