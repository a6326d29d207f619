"""Recompute the dye-library subtree manifest hash.

Usage:
    python tools/dye_manifest.py <dir>

Prints the sha256 manifest that ``enspara_tpu.data.fetch_dye_library``
verifies pinned downloads against (sha256 over sorted
``"relpath sha256(file)"`` lines).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from enspara_tpu.data.fetch_dye_library import subtree_manifest

if __name__ == '__main__':
    print(subtree_manifest(sys.argv[1]))
