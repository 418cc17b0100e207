"""Multi-scale softmax classifier inference with DenseCRF.

Mirrors the reference CLI of the same name in twke18/SPML pyscripts/.
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from spml_tpu import cli

from spml_tpu.inference import runner


def main():
    args, config = cli.parse_args('Multi-scale softmax classifier inference with DenseCRF.')
    runner.run_softmax_inference(args, config, msc=True, crf=True)


if __name__ == "__main__":
    main()
