"""Function-level similarity check vs the reference checkout.

For each function in a repo file, strip docstrings and comments, then
compare the normalized body against every function in the corresponding
reference file(s) with difflib; report the best match. Used to verify
that rewrites are genuinely original (target: < 0.5 for every function).

Usage:
    python tools/simcheck.py enspara_tpu/geometry/helix.py \
        /root/reference/enspara/geometry/helix.py
    python tools/simcheck.py --all   # the round-2 VERDICT flagged set
"""

import ast
import difflib
import io
import sys
import tokenize


def _strip(src_lines, node):
    """Return normalized body text of a function node: docstring gone,
    comments gone, identifiers kept, whitespace collapsed."""
    seg = '\n'.join(src_lines[node.lineno - 1:node.end_lineno])
    try:
        tree = ast.parse('\n'.join(
            line[node.col_offset:] if i == 0 else line
            for i, line in enumerate(seg.split('\n'))))
    except SyntaxError:
        # decorated or oddly indented; fall back to raw text
        tree = None
    if tree is not None:
        fn = tree.body[0]
        body = fn.body
        if (body and isinstance(body[0], ast.Expr)
                and isinstance(body[0].value, ast.Constant)
                and isinstance(body[0].value.value, str)):
            body = body[1:]
        seg = '\n'.join(ast.unparse(stmt) for stmt in body)
    # drop comments via tokenize on the unparsed text (unparse already
    # removes them, but the fallback path may keep them)
    out = []
    try:
        for tok in tokenize.generate_tokens(io.StringIO(seg).readline):
            if tok.type in (tokenize.COMMENT,):
                continue
            out.append(tok.string)
    except tokenize.TokenError:
        out = seg.split()
    text = ' '.join(t for t in out if t.strip())
    return text


def functions(path):
    src = open(path).read()
    lines = src.split('\n')
    tree = ast.parse(src)
    fns = {}
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            fns[node.name] = _strip(lines, node)
    return fns


def compare(repo_path, ref_path, thresh=0.0):
    ours = functions(repo_path)
    theirs = functions(ref_path)
    rows = []
    for name, body in sorted(ours.items()):
        if len(body) < 80:      # trivial bodies match by accident
            continue
        best, best_name, best_len = 0.0, '', 0
        for rname, rbody in theirs.items():
            r = difflib.SequenceMatcher(None, body, rbody).ratio()
            if r > best:
                best, best_name, best_len = r, rname, len(rbody)
        # difflib ratios on formula-sized bodies (< ~200 normalized
        # chars) are floor-dominated by tokens the public signature
        # dictates (argument names, the one numpy call the formula
        # IS); only substantial bodies carry copy signal
        trivial = min(len(body), best_len) < 200
        if best >= thresh:
            rows.append((best, name, best_name, trivial))
    return rows


FLAGGED = [
    ('enspara_tpu/geometry/helix.py',
     '/root/reference/enspara/geometry/helix.py'),
    ('enspara_tpu/geometry/dyes_from_expt_dist.py',
     '/root/reference/enspara/geometry/dyes_from_expt_dist.py'),
    ('enspara_tpu/geometry/dye_lifetimes.py',
     '/root/reference/enspara/geometry/dye_lifetimes.py'),
    ('enspara_tpu/info_theory/entropy.py',
     '/root/reference/enspara/info_theory/entropy.py'),
    ('enspara_tpu/info_theory/mutual_info.py',
     '/root/reference/enspara/info_theory/mutual_info.py'),
    ('enspara_tpu/info_theory/exposons.py',
     '/root/reference/enspara/info_theory/exposons.py'),
    ('enspara_tpu/msm/builders.py',
     '/root/reference/enspara/msm/builders.py'),
    ('enspara_tpu/tpt/tpt.py',
     '/root/reference/enspara/tpt/tpt.py'),
    ('enspara_tpu/cards/disorder.py',
     '/root/reference/enspara/cards/disorder.py'),
    ('enspara_tpu/geometry/explicit_r0_calc.py',
     '/root/reference/enspara/geometry/explicit_r0_calc.py'),
]


def sweep():
    """ALL-PAIRS cross-basename sweep: every substantial repo function
    (>= 200 normalized chars) vs every function in every non-test
    reference source file, regardless of filename — so renamed files
    cannot hide a transcription. Print all pairs >= 0.5; exit 0 iff
    none found."""
    import glob
    import os

    # collect every reference function once: (path, name, body)
    ref_fns = []
    for p in sorted(glob.glob('/root/reference/enspara/**/*.py',
                              recursive=True)):
        rel = os.path.relpath(p, '/root/reference/enspara')
        if rel.startswith('test') or os.sep + 'test' in os.sep + rel:
            continue
        try:
            for name, body in functions(p).items():
                if len(body) >= 200:
                    ref_fns.append((p, name, body))
        except SyntaxError:
            continue

    # one cached matcher per reference body (set_seq2 caches b-side)
    matchers = []
    for p, name, body in ref_fns:
        m = difflib.SequenceMatcher(None)
        m.set_seq2(body)
        matchers.append((p, name, body, m))

    hits = []
    n_checked = 0
    for p in sorted(glob.glob('enspara_tpu/**/*.py', recursive=True)):
        try:
            ours = functions(p)
        except SyntaxError:
            continue
        for name, body in sorted(ours.items()):
            if len(body) < 200:
                continue
            n_checked += 1
            for rpath, rname, rbody, m in matchers:
                # cheap upper bounds first; the real ratio only for
                # candidates that could clear the threshold
                m.set_seq1(body)
                if m.real_quick_ratio() < 0.5 or m.quick_ratio() < 0.5:
                    continue
                r = m.ratio()
                if r >= 0.5:
                    hits.append((r, p, name, rpath, rname))
    for best, p, name, ref, rname in sorted(hits, reverse=True):
        print(f'{best:.2f}  {p}:{name}  ~  {ref}:{rname}')
    print('SWEEP(all-pairs): %d functions >= 0.5 '
          '(%d repo functions x %d reference functions)'
          % (len(hits), n_checked, len(ref_fns)))
    return 1 if hits else 0


def main():
    if len(sys.argv) >= 2 and sys.argv[1] == '--sweep':
        return sweep()
    if len(sys.argv) >= 3 and sys.argv[1] != '--all':
        pairs = [(sys.argv[1], sys.argv[2])]
    else:
        pairs = FLAGGED
    worst = 0.0
    for repo_path, ref_path in pairs:
        rows = compare(repo_path, ref_path)
        flagged = [r for r in rows if r[0] >= 0.5 and not r[3]]
        print(f'== {repo_path}  '
              f'({len(flagged)} functions >= 0.5 of {len(rows)})')
        for best, name, rname, trivial in sorted(rows, reverse=True):
            mark = (' (trivial-size, ungated)'
                    if best >= 0.5 and trivial
                    else ' <<<' if best >= 0.5 else '')
            print(f'  {best:.2f}  {name}  ~  {rname}{mark}')
            if not trivial:
                worst = max(worst, best)
    print(f'\nmax similarity: {worst:.2f} '
          f'({"FAIL >= 0.5" if worst >= 0.5 else "ok"})')
    return 1 if worst >= 0.5 else 0


if __name__ == '__main__':
    sys.exit(main())
