"""Pseudo labels from softmax probs via random walk + DenseCRF.

Mirrors the reference CLI of the same name in twke18/SPML pyscripts/.
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from spml_tpu import cli

from spml_tpu.inference import runner


def main():
    args, config = cli.parse_args('Pseudo labels from softmax probs via random walk + DenseCRF.')
    # Reference uses a single-scale (flip-only) pyramid here
    # (pseudo_softmaxrw_crf.py:111-112), unlike pseudo_softmax.py's
    # [0.75, 1] x flip.
    runner.run_pseudo_softmax(args, config, with_crf=True, with_walk=True,
                              scales=(1.0,))


if __name__ == "__main__":
    main()
