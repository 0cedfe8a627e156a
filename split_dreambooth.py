#!/usr/bin/env python3
"""Split the google/dreambooth dataset into one-shot train / val sets.

Counterpart of /root/reference/split_dreambooth.py: the split file lists
one `instance,filename` pair per line (data/dreambooth_n1.txt); that file
goes to `{prefix}_train/instance/`, every other image of the instance to
`{prefix}_val/instance/`.
"""
import argparse
import os
import shutil


def parse_args():
    parser = argparse.ArgumentParser(description="Split dreambooth photos")
    parser.add_argument("--dreambooth-dir", help="Path to the dreambooth directory")
    parser.add_argument("--split-file", default="data/dreambooth_n1.txt")
    parser.add_argument("--output-dir", default="data")
    return parser.parse_args()


def split(dreambooth_dir: str, split_file: str, output_dir: str):
    with open(split_file) as f:
        lines = [ln.strip() for ln in f if ln.strip()]

    prefix = os.path.basename(split_file).split(".")[0]
    train_dir = os.path.join(output_dir, prefix + "_train")
    val_dir = os.path.join(output_dir, prefix + "_val")

    for line in lines:
        instance, filename = line.split(",")
        src_dir = os.path.join(dreambooth_dir, instance)
        os.makedirs(os.path.join(train_dir, instance), exist_ok=True)
        os.makedirs(os.path.join(val_dir, instance), exist_ok=True)
        for file in os.listdir(src_dir):
            dst_root = train_dir if file == filename else val_dir
            shutil.copy(
                os.path.join(src_dir, file),
                os.path.join(dst_root, instance, file),
            )
    return train_dir, val_dir


if __name__ == "__main__":
    args = parse_args()
    split(args.dreambooth_dir, args.split_file, args.output_dir)
