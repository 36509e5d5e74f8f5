"""Organoid-variant inference app (reference: octsam/inference/
app_organoid.py — identical UI, sister-project checkpoint loaded as a
whole pickled model ``torch.load(path + '.pth')``, app_organoid.py:12-13).

Our converter accepts both state_dicts and pickled modules (convert.py
``load_state_dict`` calls ``.state_dict()`` on module objects), so this is
the same app with a different default checkpoint argument.
"""

from __future__ import annotations

from .app import main as _main


def main(argv=None):
    return _main(argv)


if __name__ == "__main__":
    main()
