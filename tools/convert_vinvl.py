"""Convert the VinVL checkpoint (vinvl_vg_x152c4.pth) to framework-native
.npz parameters — one-time conversion so training/eval runs never import
torch (usage: python tools/convert_vinvl.py in.pth out.npz)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nl_vsgg_tpu.detector.convert import load_checkpoint


def main():
    src, dst = sys.argv[1], sys.argv[2]
    variables = load_checkpoint(src)
    import jax
    flat = {"/".join(str(getattr(k, "key", k)) for k in path): np.asarray(leaf)
            for path, leaf in jax.tree_util.tree_leaves_with_path(variables)}
    np.savez_compressed(dst, **flat)
    print(f"wrote {len(flat)} arrays -> {dst}")


from nl_vsgg_tpu.detector.convert import load_npz  # noqa: F401 (re-export)


if __name__ == "__main__":
    main()
