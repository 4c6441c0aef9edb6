"""Generate checked-in class-split documents (SURVEY.md §2a C11) — `python -m eov_tpu.tools.make_splits`.

Regenerates eov_tpu/splits/*.json deterministically from the checked-in
class lists. Run after editing a class list or adding a protocol; output is
stable for a given (class set, counts, seed).
"""

from __future__ import annotations

import os

from eov_tpu.data import class_splits as cs


def main() -> None:
    d = cs.SPLITS_DIR
    ucf = cs.load_class_list(os.path.join(d, "ucf101_classes.txt"))
    cs.save_class_split(
        os.path.join(d, "ucf101_oneshot.json"),
        cs.make_class_split(
            ucf, 70, 10, 21, seed=0, protocol="ucf101_oneshot_70_10_21"
        ),
    )
    # Kinetics-100 CMN protocol: 64/12/24 classes x 100 clips. The published
    # CMN class membership cannot be fetched in this environment (no
    # network); when kinetics100_cmn_classes.txt (the 100 CMN class names)
    # is dropped in, this regenerates the split with the CMN shape. A
    # drop-in of the published per-split lists as kinetics100_cmn.json
    # (same schema) is equally valid and takes precedence for users.
    cmn_list = os.path.join(d, "kinetics100_cmn_classes.txt")
    if os.path.exists(cmn_list):
        k100 = cs.load_class_list(cmn_list)
        cs.save_class_split(
            os.path.join(d, "kinetics100_cmn.json"),
            cs.make_class_split(
                k100, 64, 12, 24, seed=0, protocol="kinetics100_cmn_64_12_24"
            ),
        )
    print(f"splits written under {d}")


if __name__ == "__main__":
    main()
