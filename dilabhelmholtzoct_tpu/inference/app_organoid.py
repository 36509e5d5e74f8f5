"""Organoid-variant inference app (reference: octsam/inference/
app_organoid.py — identical UI, sister-project checkpoint loaded as a
whole pickled model ``torch.load(path + '.pth')``, app_organoid.py:12-13).

Same UI as app.py; the one behavioral difference is the checkpoint format:
this variant enables whole-pickled-module loading by default (convert.py
``load_state_dict(allow_pickled_module=True)`` falls back to a full
``torch.load`` and calls ``.state_dict()`` on the module object).
"""

from __future__ import annotations

from .app import main as _main


def main(argv=None):
    return _main(argv, allow_pickled_module_default=True)


if __name__ == "__main__":
    main()
