from rvt_tpu.data.types import Batch, DatasetSamplingMode
