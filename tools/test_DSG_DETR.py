"""Evaluate a trained DSG-DETR checkpoint on the AG test split
(reference tools/test_DSG_DETR.py interface)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import train_STTran as base
import test_STTran as base_test
from train_DSG_DETR import build_model


def main():
    base.build_model = build_model
    base_test.build_model = build_model
    base_test.main()


if __name__ == "__main__":
    main()
