from spml_tpu.data import datasets, transforms
