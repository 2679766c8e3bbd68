"""KCC demo dataset — annotation-free inference on arbitrary user videos.

Mirrors ``dataloader/KCC_AG/KCC_dataset.py``: frames are pre-extracted (the
reference documents the ffmpeg command in kcc_demo/video_cmd.txt, e.g.
``ffmpeg -i video.mp4 -vf fps=3 dataset/<name>/frame/%06d.png``) into
``<data_path>/dataset/<video>/frame/*.png``; each item is one whole video of
preprocessed frames with no GT. Used by the KCC demo CLI (the reference's
KCC_TEMPURA.py / KCC_TEATGT.py inference-and-dump-JSON surface).
"""

from __future__ import annotations

import os

import numpy as np

from vidsgg.data.action_genome import im_list_to_blob, prep_im_for_blob


class KCCDataset:
    def __init__(self, data_path: str):
        self.data_path = data_path
        root = os.path.join(data_path, "dataset")
        self.video_names = sorted(
            d for d in os.listdir(root)
            if os.path.isdir(os.path.join(root, d, "frame"))
        ) if os.path.isdir(root) else []
        self.video_frames = {
            v: sorted(
                os.path.join(root, v, "frame", f)
                for f in os.listdir(os.path.join(root, v, "frame"))
                if f.lower().endswith((".png", ".jpg", ".jpeg"))
            )
            for v in self.video_names
        }

    def __len__(self):
        return len(self.video_names)

    def load_video_frames(self, index: int, target_min_side: int | None = None):
        """``target_min_side`` overrides the min-side resize target (the
        reference hardcodes 600; the demo CLI's --frame_size rehearsal hook
        shrinks it, like the AG loader's)."""
        import cv2

        from vidsgg import constants as C

        target = target_min_side or C.TARGET_MIN_SIDE
        name = self.video_names[index]
        ims, scales = [], []
        for path in self.video_frames[name]:
            im = cv2.imread(path, cv2.IMREAD_UNCHANGED)
            im, scale = prep_im_for_blob(im, target)
            ims.append(im)
            scales.append(scale)
        return im_list_to_blob(ims), scales[0], name
