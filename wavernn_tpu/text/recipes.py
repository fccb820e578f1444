"""Dataset metadata recipes (ref: utils/text/recipes.py).

A recipe maps a dataset directory to ``{utterance_id: transcript}``.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Union

from wavernn_tpu.utils.files import get_files


def ljspeech(path: Union[str, Path]) -> Dict[str, str]:
    """LJSpeech-style ``metadata.csv``: ``id|raw text|normalized text``.
    The last field (normalized) is used, matching the reference."""
    csv_file = get_files(path, extension=".csv")
    assert len(csv_file) == 1, f"expected exactly one .csv under {path}"

    text_dict: Dict[str, str] = {}
    with open(csv_file[0], encoding="utf-8") as f:
        for line in f:
            split = line.split("|")
            text_dict[split[0]] = split[-1]
    return text_dict
