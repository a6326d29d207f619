"""Shared CLI helpers. (reference: enspara/apps/util.py)"""

import argparse
import os
from glob import glob


class readable_dir(argparse.Action):
    """Argparse action checking the option's parent directory exists and
    is readable. (reference: apps/util.py:6)"""

    def __call__(self, parser, namespace, values, option_string=None):
        prospective_dir = os.path.dirname(os.path.abspath(values))
        if not os.path.isdir(prospective_dir):
            raise argparse.ArgumentTypeError(
                'readable_dir:{0} is not a valid path'.format(
                    prospective_dir))
        if os.access(prospective_dir, os.R_OK):
            setattr(namespace, self.dest, values)
        else:
            raise argparse.ArgumentTypeError(
                'readable_dir:{0} is not a readable dir'.format(
                    prospective_dir))


def expand_files(pgroups):
    """Glob-expand each file group. (reference: cluster/util.py:315)"""
    expanded = []
    for pgroup in pgroups:
        expanded.append([])
        for p in pgroup:
            hits = sorted(glob(p))
            expanded[-1].extend(hits if hits else [p])
    return expanded
