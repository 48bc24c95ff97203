from bist_tpu.data.avsd import load_avsd, Example
from bist_tpu.data.batching import Batch, make_batch, pad_to, bucket_len
from bist_tpu.data.features import FeatureStore, feature_shape
