"""SWINT ablation model: one training epoch through the CLI."""

import numpy as np

from tests.test_end_to_end import make_tree, TINY_ARGS


def test_swint_train_one_epoch(tmp_path):
    from speinet_tpu.main_train import main

    root = make_tree(tmp_path / "ds")
    exp = tmp_path / "exp"
    main(["--template", "SWINT", "--dir_data", str(root),
          "--dir_data_test", str(root), "--experiment_dir", str(exp) + "/",
          "--save", "swint", "--epochs", "1"] + TINY_ARGS)
    psnr = np.load(exp / "swint" / "psnr.npy")
    assert len(psnr) == 1 and np.isfinite(psnr[0])
    assert (exp / "swint" / "model" / "model_best").exists()
