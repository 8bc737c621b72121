"""SWINT training entry (parity: main_swint.py) — the SPEINet trainer with
the SWINT ablation template.

    python -m speinet_tpu.main_swint --dir_data ... --dir_data_test ...
"""

from __future__ import annotations

import sys

from speinet_tpu.main_train import main as _main


def main(argv=None):
    argv = list(argv if argv is not None else sys.argv[1:])
    if "--template" not in argv:
        argv = ["--template", "SWINT"] + argv
    _main(argv)


if __name__ == "__main__":
    main()
