"""`enspara` dispatcher: route subcommands to app mains.
(reference: enspara/apps/main.py)
"""

import argparse
import importlib
import sys

# subcommand -> module (relative to this package); smfret-* extend the
# reference's dispatcher (apps/main.py:5), where the smFRET tools are
# standalone scripts only
_APP_MODULES = {
    'cluster': '.cluster',
    'implied': '.implied_timescales',
    'reassign': '.reassign',
    'cards': '.collect_cards',
    'entropy': '.shannon_entropy',
    'smfret-dyes': '.smFRET_dye_MC',
    'smfret-clouds': '.smFRET_point_clouds',
}


def identify_app(argv):
    """(reference: apps/main.py:5)"""
    parser = argparse.ArgumentParser(
        prog='enspara',
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        description='Main entry point for enspara_tpu apps.')
    parser.add_argument('appname', choices=set(_APP_MODULES),
                        help='Name of the application.')
    parser.add_argument('appargs', nargs=argparse.REMAINDER,
                        help='Arguments to the app.')

    # help flags beyond position 1 belong to the APP's parser, not the
    # dispatcher's — set them aside and re-append after parsing
    deferred = []
    kept = argv[:2]
    for tok in argv[2:]:
        (deferred if tok in ('--help', '-h') else kept).append(tok)
    argv[:] = kept

    args = parser.parse_args(argv[1:])
    module = importlib.import_module(_APP_MODULES[args.appname],
                                     package=__package__)
    args.main = module.main
    args.appargs.extend(deferred)
    return args


def main(argv=None):
    args = identify_app(sys.argv if argv is None else argv)
    try:
        # [appname] + appargs restores the full app argv, including the
        # help flags identify_app set aside: the reference passes its
        # mutated argv (apps/main.py:49), so `enspara cluster --help`
        # silently drops --help there — deliberate fix, not a port of
        # that bug
        args.main([args.appname] + args.appargs)
    except Exception:
        sys.stderr.write(
            'An unexpected error has occurred; please consider filing '
            'an issue at the project issue tracker.\n')
        raise
    return 0


if __name__ == '__main__':
    sys.exit(main(sys.argv))
