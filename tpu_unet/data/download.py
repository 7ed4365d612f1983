"""Dataset acquisition (reference ``data.py:316-456``).

Fetches the Cell Tracking Challenge archives and the ISBI2012 multipage
TIFFs into the reference's on-disk layout (``data/{NAME}-{training|challenge}``
with ``0N`` image dirs and ``0N_GT/SEG`` labels), so ingest works identically
on reference-downloaded and self-downloaded trees.

Uses stdlib urllib (the reference shells out to wget / uses requests). The
Google-Drive pretrained-torch-checkpoint fetcher (``data.py:398-452``) has a
counterpart in `download_pretrained` — the fetched ``.pth`` files are
directly consumable by the CLI TESTING path, which converts torch
checkpoints to Flax parameters on the fly (``convert.py``).

Note: air-gapped environments (like the build/CI container) cannot reach
these hosts; callers should catch `DownloadError` and fall back to
`tpu_unet.data.synthetic`. The ISBI host (brainiac2.mit.edu) is defunct
upstream (SURVEY.md §2.12).
"""

from __future__ import annotations

import os
import zipfile
from typing import Optional, Tuple

import numpy as np

CTC_URL = "http://data.celltrackingchallenge.net/{kind}-datasets/{name}.zip"
ISBI_URL = "http://brainiac2.mit.edu/isbi_challenge/sites/default/files/{t}-{folder}.tif"


class DownloadError(RuntimeError):
    pass


def _fetch(url: str, dest: str, timeout: float = 60.0) -> None:
    import urllib.request

    try:
        with urllib.request.urlopen(url, timeout=timeout) as r, open(dest, "wb") as f:
            while True:
                chunk = r.read(1 << 20)
                if not chunk:
                    break
                f.write(chunk)
    except Exception as e:  # pragma: no cover - network dependent
        raise DownloadError(f"failed to fetch {url}: {e}") from e


def download_ctc(data_dir: str, name: str, kind: str = "training") -> str:
    """Download + extract one CTC dataset to ``{data_dir}/{name}-{kind}``."""
    folder = os.path.join(data_dir, f"{name}-{kind}")
    if os.path.isdir(folder):
        return folder
    os.makedirs(data_dir, exist_ok=True)
    zpath = os.path.join(data_dir, f"{name}.zip")
    _fetch(CTC_URL.format(kind=kind, name=name), zpath)
    with zipfile.ZipFile(zpath) as z:
        z.extractall(data_dir)
    os.rename(os.path.join(data_dir, name), folder)
    os.remove(zpath)
    return folder


def download_isbi(data_dir: str, kind: str = "training") -> str:
    """Download ISBI2012 and split the multipage TIFFs into the CTC-style
    layout, converting label frames to instance masks via connected components
    (reference ``data.py:331-381``; CC runs through our own op, not cv2)."""
    from PIL import Image

    import jax.numpy as jnp

    from tpu_unet.ops.cc import connected_components

    t = "train" if kind == "training" else "test"
    folder = os.path.join(data_dir, f"ISBI2012-{kind}")
    if os.path.isdir(folder):
        return folder
    os.makedirs(folder, exist_ok=True)
    folders: Tuple[str, ...] = ("volume", "labels") if kind == "training" else ("volume",)
    for kindname in folders:
        tif = os.path.join(folder, f"{t}-{kindname}.tif")
        _fetch(ISBI_URL.format(t=t, folder=kindname), tif)
        seq = "01" if kindname == "volume" else "01_GT"
        outdir = os.path.join(folder, seq, "SEG") if kindname == "labels" \
            else os.path.join(folder, seq)
        os.makedirs(outdir, exist_ok=True)
        img = Image.open(tif)
        i = 0
        while True:
            try:
                img.seek(i)
            except EOFError:
                break
            frame = np.asarray(img)
            if kindname == "volume":
                Image.fromarray(frame).save(os.path.join(outdir, f"t{i:03d}.tif"))
            else:
                lab = np.asarray(
                    connected_components(jnp.asarray(frame > 0))
                )
                # compact sentinel background to 0, components to 1..K
                ids = np.unique(lab[frame > 0])
                compact = np.zeros(lab.shape, np.int32)
                for k, v in enumerate(ids, start=1):
                    compact[lab == v] = k
                Image.fromarray(compact.astype(np.uint16)).save(
                    os.path.join(outdir, f"man_seg{i:03d}.tif"))
            i += 1
    return folder


def download_all(data_dir: str) -> None:
    """All three workloads (reference ``data.py:384-395``)."""
    for name in ("DIC-C2DH-HeLa", "PhC-C2DH-U373"):
        for kind in ("training", "challenge"):
            download_ctc(data_dir, name, kind)
    for kind in ("training", "challenge"):
        download_isbi(data_dir, kind)


# --- pretrained checkpoints (reference ``data.py:398-452``) ------------------

GDRIVE_URL = "https://docs.google.com/uc?export=download"

# The reference's published pretrained torch checkpoints (data.py:438-442).
PRETRAINED_MODEL_IDS = {
    "ISBI2012": "1tivQbiNkaQLlEN5ck5JYHyH1hczH_Kgq",
    "DIC-C2DH-HeLa": "1Fn5_wSYEFX50orh_qYWDc2BkWjCByRmC",
    "PhC-C2DH-U373": "1SWuBGSgQJvR2yBZpR4CSEoOQj2_pGfVI",
}


def _parse_drive_interstitial(html: str):
    """Extract (action_url, params) from Drive's download-warning HTML form.
    Since ~2022 the confirm token rides in hidden form inputs (the
    ``download_warning`` cookie is gone); the form posts to
    drive.usercontent.google.com with id/export/confirm/uuid fields."""
    import re

    m = re.search(r'<form[^>]*action="([^"]+)"', html)
    if not m:
        return None
    action = m.group(1).replace("&amp;", "&")
    params = {}
    for name, value in re.findall(
            r'<input[^>]*name="([^"]+)"[^>]*value="([^"]*)"', html):
        params[name] = value
    return action, params


def fetch_gdrive(file_id: str, dest: str, *, base_url: str = GDRIVE_URL,
                 timeout: float = 60.0) -> None:
    """Fetch a Google-Drive file by id (reference ``data.py:398-431``): the
    first GET may answer with a virus-scan interstitial instead of the
    payload. Two confirm mechanisms are handled: the legacy
    ``download_warning`` cookie (the reference's mechanism) and the current
    HTML form whose hidden inputs carry the confirm token/uuid. Stdlib
    cookie-aware urllib, streamed to `dest`; an interstitial that cannot be
    resolved raises DownloadError rather than leaving HTML on disk."""
    import http.cookiejar
    import urllib.request
    from urllib.parse import urlencode

    jar = http.cookiejar.CookieJar()
    opener = urllib.request.build_opener(
        urllib.request.HTTPCookieProcessor(jar))

    def get(url, params):
        return opener.open(f"{url}&{urlencode(params)}"
                           if "?" in url
                           else f"{url}?{urlencode(params)}",
                           timeout=timeout)

    def stream_to_dest(r) -> bytes:
        """Write the response to dest; returns the first KB for sniffing."""
        head = b""
        with r, open(dest, "wb") as f:
            while True:
                chunk = r.read(1 << 20)
                if not chunk:
                    break
                if len(head) < 1024:
                    head += chunk[:1024]
                f.write(chunk)
        return head

    try:
        r = get(base_url, {"id": file_id})
        token = next((c.value for c in jar
                      if c.name.startswith("download_warning")), None)
        if token:
            r.close()
            r = get(base_url, {"id": file_id, "confirm": token})
        head = stream_to_dest(r)
        if head.lstrip()[:15].lower() not in (b"<!doctype html>",) and \
                not head.lstrip().lower().startswith(b"<html"):
            return
        # The payload was the HTML interstitial: parse the confirm form.
        with open(dest, "r", errors="replace") as f:
            parsed = _parse_drive_interstitial(f.read())
        os.remove(dest)
        if parsed is None:
            raise DownloadError(
                f"drive id {file_id}: interstitial page with no download "
                f"form (quota exceeded or file removed)")
        action, params = parsed
        params.setdefault("id", file_id)
        head = stream_to_dest(get(action, params))
        if head.lstrip().lower().startswith((b"<!doctype", b"<html")):
            os.remove(dest)
            raise DownloadError(
                f"drive id {file_id}: still served HTML after form confirm")
    except DownloadError:
        raise
    except Exception as e:  # pragma: no cover - network dependent
        raise DownloadError(f"failed to fetch drive id {file_id}: {e}") from e


def download_pretrained(models_dir: str, name: str, *,
                        file_id: Optional[str] = None,
                        base_url: str = GDRIVE_URL) -> str:
    """Fetch + extract one pretrained checkpoint zip (reference
    ``download_all_models``, ``data.py:433-452``). Skips if
    ``{models_dir}/{name}`` already exists, like the reference. The extracted
    ``.pth`` is directly consumable by ``cli -m TESTING -n <path>.pth``
    (on-the-fly torch->Flax conversion, ``convert.py``)."""
    if file_id is None:
        try:
            file_id = PRETRAINED_MODEL_IDS[name]
        except KeyError:
            raise DownloadError(
                f"no published pretrained checkpoint for {name!r}; known: "
                f"{sorted(PRETRAINED_MODEL_IDS)}") from None
    os.makedirs(models_dir, exist_ok=True)
    target = os.path.join(models_dir, name)
    if os.path.isdir(target):
        return target
    zpath = os.path.join(models_dir, f"{name}.zip")
    try:
        fetch_gdrive(file_id, zpath, base_url=base_url)
        try:
            with zipfile.ZipFile(zpath) as z:
                z.extractall(models_dir)
        except zipfile.BadZipFile as e:
            # callers are documented to catch DownloadError, and a stale
            # partial zip must not poison the retry
            raise DownloadError(
                f"pretrained {name}: fetched file is not a zip ({e})") from e
    finally:
        if os.path.exists(zpath):
            os.remove(zpath)
    return target


if __name__ == "__main__":  # runnable standalone like reference data.py:454
    import sys

    download_all(sys.argv[1] if len(sys.argv) > 1 else "data")
    for _name in PRETRAINED_MODEL_IDS:
        try:
            download_pretrained("models", _name)
        except DownloadError as e:
            print(f"pretrained {_name}: {e}")
