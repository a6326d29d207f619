"""`enspara` dispatcher: route subcommands to app mains.
(reference: enspara/apps/main.py)
"""

import argparse
import sys


def identify_app(argv):
    """(reference: apps/main.py:5)"""
    parser = argparse.ArgumentParser(
        prog='enspara',
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        description='Main entry point for enspara_tpu apps.')

    parser.add_argument(
        'appname',
        choices={'cluster', 'implied', 'reassign', 'cards', 'entropy',
                 'smfret-dyes', 'smfret-clouds'},
        help='Name of the application. (smfret-* are additions over '
             "the reference's dispatcher, apps/main.py:5, where the "
             'smFRET tools are standalone scripts only.)')
    parser.add_argument(
        'appargs', nargs=argparse.REMAINDER,
        help='Arguments to the app.')

    helpstack = []
    for h in ['--help', '-h']:
        while h in argv and argv.index(h) != 1:
            argv.remove(h)
            helpstack.append(h)

    args = parser.parse_args(argv[1:])

    if args.appname == 'cluster':
        from .cluster import main
    elif args.appname == 'implied':
        from .implied_timescales import main
    elif args.appname == 'reassign':
        from .reassign import main
    elif args.appname == 'cards':
        from .collect_cards import main
    elif args.appname == 'entropy':
        from .shannon_entropy import main
    elif args.appname == 'smfret-dyes':
        from .smFRET_dye_MC import main
    elif args.appname == 'smfret-clouds':
        from .smFRET_point_clouds import main

    args.main = main
    args.appargs.extend(helpstack)
    return args


def main(argv=None):
    if argv is None:
        argv = sys.argv
    args = identify_app(argv)
    try:
        # [appname] + appargs == argv[1:] except that help flags
        # stripped by identify_app are restored (appended): the
        # reference passes the mutated argv (apps/main.py:49), so
        # `enspara cluster --help` silently drops --help there —
        # deliberate fix, not a port of that bug
        args.main([args.appname] + args.appargs)
    except Exception:
        print('An unexpected error has occurred; please consider filing '
              'an issue at the project issue tracker.', file=sys.stderr)
        raise
    return 0


if __name__ == '__main__':
    sys.exit(main(sys.argv))
