"""Build multi-scale semantic prototype memory banks.

Mirrors the reference CLI of the same name in twke18/SPML pyscripts/.
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from spml_tpu import cli

from spml_tpu.inference import runner


def main():
    args, config = cli.parse_args('Build multi-scale semantic prototype memory banks.')
    runner.run_prototype(args, config, scales=[0.5, 1.0, 1.5])


if __name__ == "__main__":
    main()
