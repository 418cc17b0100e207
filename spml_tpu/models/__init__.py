from spml_tpu.models import resnet, spp, local, embeddings
