from deepsir_tpu.data.datasets import get_train_datasets, get_test_dataset  # noqa: F401
from deepsir_tpu.data.base import PairDataset, make_pair_arrays, Loader  # noqa: F401
