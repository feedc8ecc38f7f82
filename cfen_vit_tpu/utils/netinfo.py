"""Network introspection (--verbose parity, ref base_model.py:134-145:
per-network parameter counts, structure printout)."""

from __future__ import annotations

import numpy as np


def count_params(tree) -> int:
    total = 0
    if isinstance(tree, dict):
        for v in tree.values():
            total += count_params(v)
    elif isinstance(tree, (list, tuple)):
        for v in tree:
            total += count_params(v)
    elif hasattr(tree, "size"):
        total += int(np.prod(tree.shape)) if tree.ndim else 1
    return total


def _structure_lines(tree, prefix="", depth=0, max_depth=2):
    lines = []
    if isinstance(tree, dict) and depth < max_depth:
        for k, v in tree.items():
            sub = count_params(v)
            if isinstance(v, dict) and depth + 1 < max_depth:
                lines.append(f"{'  ' * depth}{k}/")
                lines += _structure_lines(v, prefix, depth + 1, max_depth)
            else:
                lines.append(f"{'  ' * depth}{k}: {sub:,} params")
    return lines


def print_networks(named_params: dict, verbose: bool = False) -> None:
    """named_params: {'G': tree, 'D_A': tree, ...} (ref prints each net and
    its total parameter count in millions)."""
    print("---------- Networks initialized -------------")
    for name, tree in named_params.items():
        n = count_params(tree)
        if verbose:
            for line in _structure_lines(tree):
                print(line)
        print(f"[Network {name}] Total number of parameters : "
              f"{n / 1e6:.3f} M")
    print("-----------------------------------------------")
