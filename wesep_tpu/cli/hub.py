"""Pretrained-model hub: download/caching of released TSE models.

Equivalent of /root/reference/wesep/cli/hub.py:87-123 (modelscope-hosted
bsrnn_ecapa_vox1.tar.gz cached under ~/.wesep/<lang>). This environment has
no egress, so download failures fall back with a clear message; local
model dirs (config.yaml + avg_model.ckpt) always work via
Extractor(model_dir).
"""

import os
import tarfile
import urllib.request

__all__ = ["Hub"]


class Hub:
    Assets = {
        "english": "bsrnn_ecapa_vox1.tar.gz",
        "chinese": "bsrnn_ecapa_cnceleb.tar.gz",
    }
    BaseURL = (
        "https://www.modelscope.cn/models/wenet/wesep-pretrained/resolve/"
        "master/"
    )

    @staticmethod
    def get_model(lang: str) -> str:
        if lang not in Hub.Assets:
            raise ValueError(
                f"no pretrained model for language {lang!r}; "
                f"available: {sorted(Hub.Assets)}"
            )
        archive = Hub.Assets[lang]
        model_dir = os.path.join(
            os.path.expanduser("~"), ".wesep", lang
        )
        os.makedirs(model_dir, exist_ok=True)
        marker = os.path.join(model_dir, ".complete")
        if os.path.exists(marker):
            return model_dir
        target = os.path.join(model_dir, archive)
        try:
            urllib.request.urlretrieve(Hub.BaseURL + archive, target)
            with tarfile.open(target) as tar:
                tar.extractall(model_dir)
            os.remove(target)
            Hub._normalize_model_dir(model_dir)
            with open(marker, "w") as f:
                f.write("ok\n")
            return model_dir
        except Exception as e:
            raise RuntimeError(
                f"failed to download pretrained model ({e}); pass a local "
                "model dir (config.yaml + avg_model.ckpt) via -p/--pretrain"
            ) from e

    @staticmethod
    def _normalize_model_dir(model_dir: str) -> None:
        """Make an extracted archive loadable by the Extractor.

        Released reference archives (hub layout, reference
        cli/hub.py:87-123) contain config.yaml + torch avg_model.pt;
        archives published for this stack contain avg_model.ckpt
        directly. Flatten a single top-level archive subdir and
        auto-convert a torch checkpoint via tools/convert_torch_checkpoint
        (separator core; the wespeaker speaker branch is re-initialized —
        the Extractor warns about the quality caveat)."""
        entries = [e for e in os.listdir(model_dir)
                   if not e.startswith(".")]
        if len(entries) == 1 and os.path.isdir(
            os.path.join(model_dir, entries[0])
        ):
            sub = os.path.join(model_dir, entries[0])
            for item in os.listdir(sub):
                os.replace(os.path.join(sub, item),
                           os.path.join(model_dir, item))
            os.rmdir(sub)
        ckpt = os.path.join(model_dir, "avg_model.ckpt")
        pt = os.path.join(model_dir, "avg_model.pt")
        if not os.path.exists(ckpt) and os.path.exists(pt):
            import subprocess
            import sys

            subprocess.run(
                [sys.executable, "-m",
                 "wesep_tpu.tools.convert_torch_checkpoint",
                 "--torch_ckpt", pt,
                 "--config", os.path.join(model_dir, "config.yaml"),
                 "--out", ckpt],
                check=True,
            )
