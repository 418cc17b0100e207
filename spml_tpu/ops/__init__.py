from spml_tpu.ops import common, kmeans, losses, knn
