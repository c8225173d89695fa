"""Benchmark dataset registries: OfficeHome and DomainNet.

The reference hardcodes OfficeHome domain names inside its drivers
(``/root/reference/test_cross_domain.py:27``); DomainNet support is required
by BASELINE.json config 4 (345 classes, 6 domains).  Both datasets are
ImageFolder-per-domain trees, so the generic pipeline covers them — these
registries provide the canonical domain lists and helpers.
"""

from __future__ import annotations

import os
from typing import Dict, List, Sequence

OFFICEHOME_DOMAINS = ["Real World", "Art", "Clipart", "Product"]
# The reference's few-shot class subsets:
OFFICEHOME_TRAIN_CLASSES = ["Backpack", "Alarm_Clock", "Laptop", "Pen", "Mug"]  # train.py:38
OFFICEHOME_SEEN_CLASSES = ["Backpack", "Alarm_Clock", "Laptop", "Pen"]  # test_cross_domain.py:25
OFFICEHOME_UNSEEN_CLASSES = ["Clipboards"]  # test_cross_domain.py:26

DOMAINNET_DOMAINS = ["clipart", "infograph", "painting", "quickdraw", "real", "sketch"]
DOMAINNET_NUM_CLASSES = 345

DATASETS: Dict[str, Dict] = {
    "officehome": {
        "domains": OFFICEHOME_DOMAINS,
        "default_source": "Real World",
        "train_classes": OFFICEHOME_TRAIN_CLASSES,
    },
    "domainnet": {
        "domains": DOMAINNET_DOMAINS,
        "default_source": "real",
        "train_classes": None,  # discovered from the tree (345 classes)
    },
}


def discover_classes(domain_root: str, domain: str) -> List[str]:
    """All class folder names for a domain, sorted (ImageFolder order)."""
    d = os.path.join(domain_root, domain)
    return sorted(
        name for name in os.listdir(d) if os.path.isdir(os.path.join(d, name))
    )


def common_classes(domain_root: str, domains: Sequence[str]) -> List[str]:
    """Classes present in every listed domain (safe transfer-matrix set)."""
    sets = [set(discover_classes(domain_root, d)) for d in domains]
    return sorted(set.intersection(*sets)) if sets else []
