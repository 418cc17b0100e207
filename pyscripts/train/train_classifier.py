"""Stage-2 softmax classifier training over a frozen embedding model.

Mirrors the reference CLI of the same name in twke18/SPML pyscripts/.
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from spml_tpu import cli

from spml_tpu.data import datasets
from spml_tpu.train import driver


def main():
    args, config = cli.parse_args("Training softmax classifier.")
    driver.train_classifier(args, config, datasets.ListTagClassifierDataset)


if __name__ == "__main__":
    main()
