"""KNN-retrieval pseudo labels with tag mask, prob floor and DenseCRF.

Mirrors the reference CLI of the same name in twke18/SPML pyscripts/.
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from spml_tpu import cli

from spml_tpu.inference import runner


def main():
    args, config = cli.parse_args('KNN-retrieval pseudo labels with tag mask, prob floor and DenseCRF.')
    runner.run_pseudo_knn(args, config)


if __name__ == "__main__":
    main()
