"""Convert the VinVL checkpoint (vinvl_vg_x152c4.pth) to framework-native
.npz parameters — one-time conversion so training/eval runs never import
torch (usage: python tools/convert_vinvl.py in.pth out.npz)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nl_vsgg_tpu.detector.convert import load_checkpoint, save_npz


def main():
    src, dst = sys.argv[1], sys.argv[2]
    n = save_npz(load_checkpoint(src), dst)
    print(f"wrote {n} arrays -> {dst}")


from nl_vsgg_tpu.detector.convert import load_npz  # noqa: F401 (re-export)


if __name__ == "__main__":
    main()
