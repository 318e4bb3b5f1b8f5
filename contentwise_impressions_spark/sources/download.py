"""Driver-side archive fetch for the per-corpus dataset readers.

Reference: ``download_from_URL`` at
/root/reference/Data_manager/DataReader_utils.py:312-337 — plain
urlretrieve with a progress reporthook and manual folder creation.  This
rebuild keeps it driver-side (fetching one archive is not distributed
work) and adds what a pipeline actually needs from the step: skip-if-cached
semantics, atomic writes (no half-downloaded file is ever visible at the
destination path), and bounded retries.  Tested offline via ``file://``
URLs; the container has no network, which the caller surfaces as the
normal URLError path.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import urllib.error
import urllib.request


def download_from_url(
    url: str,
    dest_path: str,
    overwrite: bool = False,
    retries: int = 3,
) -> str:
    """Fetch `url` to `dest_path`; returns `dest_path`.

    - cached: if the destination exists and `overwrite` is False, no
      request is made (the reference's split-cache idiom applied here).
    - atomic: the payload lands in a temp file in the same directory and
      is os.replace()d over the destination only when complete.
    - bounded retries on URLError, re-raising the last failure.
    """
    if os.path.exists(dest_path) and not overwrite:
        return dest_path
    folder = os.path.dirname(dest_path) or "."
    os.makedirs(folder, exist_ok=True)

    last: Exception | None = None
    for _ in range(max(1, retries)):
        fd, tmp = tempfile.mkstemp(dir=folder, suffix=".part")
        os.close(fd)
        try:
            with urllib.request.urlopen(url) as resp, open(tmp, "wb") as out:
                shutil.copyfileobj(resp, out)
            os.replace(tmp, dest_path)
            return dest_path
        except urllib.error.URLError as ex:
            last = ex
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
    assert last is not None
    raise last
