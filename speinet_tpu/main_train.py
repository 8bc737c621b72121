"""Training entry point (parity: main_SPEINet.py / main_swint.py).

    python -m speinet_tpu.main_train --template SPEINet \
        --dir_data <train-tree> --dir_data_test <val-tree> \
        --experiment_dir ./experiment --save myrun
"""

from __future__ import annotations

import sys

import jax
import numpy as np

from speinet_tpu.config import parse_args
from speinet_tpu.data.loader import Data
from speinet_tpu.models import make_model
from speinet_tpu.parallel.mesh import make_mesh_for_batch, maybe_init_distributed
from speinet_tpu.training.trainer import Trainer
from speinet_tpu.utils.logging import Logger


def main(argv=None):
    from speinet_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    cfg = parse_args(argv)
    maybe_init_distributed()
    np.random.seed(cfg.seed)   # host-side seed (main_SPEINet.py:10-12)

    chkp = Logger(cfg)
    chkp.write_log(f"devices: {jax.devices()}")
    model = make_model(cfg)
    data = Data(cfg)
    mesh = make_mesh_for_batch(cfg.batch_size, cfg.dp_devices)
    chkp.write_log(f"dp mesh: {mesh.devices.size} device(s)")
    t = Trainer(cfg, data, model, chkp, mesh=mesh)
    while not t.terminate():
        t.train()
        t.test()
    chkp.done()


if __name__ == "__main__":
    main(sys.argv[1:])
