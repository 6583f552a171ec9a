from sgformer_tpu.data.ncdataset import NCDataset  # noqa: F401
from sgformer_tpu.data.loaders import load_dataset  # noqa: F401
from sgformer_tpu.data.metrics import eval_acc, eval_f1, eval_rocauc  # noqa: F401
from sgformer_tpu.data.splits import class_rand_splits, rand_train_test_idx  # noqa: F401
from sgformer_tpu.data.feature_store import FeatureStore  # noqa: F401
