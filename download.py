#!/usr/bin/env python3
"""Textual-Inversion dataset downloader.

Counterpart of /root/reference/download.py (gdown fetch of the TI images).
Gated: network egress and the `gdown` package may be unavailable — the
script degrades to printing the manifest so users can fetch manually.
"""
import argparse
import os

TI = {
    "cat_statue/2.jpeg": "13MHHN99hWVf4_BF6NVXoxPUjtobGW2Rd",
    "clock/1.jpeg": "1hbysyK688nagfNHaunbfwGmkpLDSW11l",
    "colorful_teapot/1.jpeg": "1A2kbBFoCNIK6DjnBCU1fVUUTclchIs3S",
    "elephant/3.jpg": "1xM43EM1D6T9esQwNfne0C3ZdIa63hua2",
    "mug_skulls/3.jpeg": "1--AY_FbK0_VP1sjgFzCDCPKpM9rhiu1L",
    "physics_mug/3.jpeg": "1vaRwcNASmxx62VPJmsPH_qPjQDrDmmXK",
    "red_teapot/1.jpeg": "11UNMcWroD9b4y1npxKrCUsVeLEmvajvC",
    "round_bird/4.jpg": "1e0KpoKiCa0kcqMpe7Mu5gjh-IcRy6R7_",
    "thin_bird/4.jpeg": "1-iZ_VEu4IQDOv0ywRLXab-z-1WlP5h1G",
}


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out-dir", type=str, default=".")
    parser.add_argument("--manifest-only", action="store_true")
    return parser.parse_args()


def main(args):
    try:
        import gdown  # noqa: F401

        have_gdown = True
    except ImportError:
        have_gdown = False

    for key, file_id in TI.items():
        url = f"https://drive.google.com/uc?id={file_id}"
        dst = os.path.join(args.out_dir, key)
        if args.manifest_only or not have_gdown:
            print(f"{url} -> {dst}")
            continue
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        gdown.download(url, dst, quiet=False)
    if not have_gdown and not args.manifest_only:
        print("gdown unavailable; printed manifest instead (zero-egress env).")


if __name__ == "__main__":
    main(parse_args())
