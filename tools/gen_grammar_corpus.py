#!/usr/bin/env python3
"""Generate the grammar-production query corpus.

Walks the reference's pyleri grammar (/root/reference/grammar/
grammar.py) the way itest/test_grammar.py does (querygenerator/
querygenerator.py:5-138 + k_map.py): every grammar production is
expanded once, regex terminals are substituted with the k_map
placeholder values, and productions the itest skips (replace_map) are
pruned. The result is a static corpus committed at
src/test/resources/grammar_corpus.txt; ParserFuzzSpec feeds every line
through QueryParser and requires parse-or-reference-error, never a
crash.

pyleri is not installed here, so a minimal structural shim below
carries just enough of its element model (element classes, attribute
naming, Prio-in-Rule wrapping) for grammar.py to import unchanged.
This file is a build-time tool: it only READS the reference grammar;
the walk itself is an independent implementation.
"""

import itertools
import os
import sys
import types


# ---------------------------------------------------------------- shim
class _El:
    # NB: no class-level `name` — grammar.py's _set_attribute probes
    # hasattr(value, 'name') to detect double-assignment
    pass


def _tok(e):
    return Token(e) if isinstance(e, str) else e


class Keyword(_El):
    def __init__(self, kw):
        self._keyword = kw


class Token(_El):
    def __init__(self, t):
        self._token = t


class Tokens(_El):
    def __init__(self, ts):
        self._tokens = sorted(ts.split(), key=len, reverse=True)


class Regex(_El):
    def __init__(self, pattern):
        self._pattern = pattern


class Sequence(_El):
    def __init__(self, *els):
        self._elements = [_tok(e) for e in els]


class Choice(_El):
    def __init__(self, *els, most_greedy=True):
        self._elements = [_tok(e) for e in els]


class Optional(_El):
    def __init__(self, el):
        self._elements = [_tok(el)]


class Repeat(_El):
    def __init__(self, el, mi=0, ma=None):
        self._element = _tok(el)
        self._elements = [self._element]
        self._min, self._max = mi, ma


class List(_El):
    def __init__(self, el, delimiter=',', mi=0, ma=None):
        self._element = _tok(el)
        self._elements = [self._element]
        self._delimiter = _tok(delimiter)
        self._min, self._max = mi, ma


class Prio(_El):
    def __init__(self, *els):
        self._elements = [_tok(e) for e in els]


class Rule(_El):
    def __init__(self, el):
        self._element = el


class This(_El):
    pass


THIS = This()


class Ref(_El):
    def __init__(self):
        self._element = None


class _GrammarMeta(type):
    def __new__(mcs, cname, bases, ns):
        order = []
        for k, v in list(ns.items()):
            if isinstance(v, Prio):
                v = Rule(v)
                ns[k] = v
            if isinstance(v, _El) and not hasattr(v, 'name'):
                v.name = k
                order.append(k)
        ns.setdefault('_order', order)
        return super().__new__(mcs, cname, bases, ns)


class Grammar(metaclass=_GrammarMeta):
    pass


def _install_shim():
    m = types.ModuleType('pyleri')
    for n in ('Choice', 'Grammar', 'Keyword', 'List', 'Optional', 'Prio',
              'Ref', 'Regex', 'Repeat', 'Sequence', 'THIS', 'Token',
              'Tokens', 'Rule'):
        setattr(m, n, globals()[n])
    sys.modules['pyleri'] = m


# ------------------------------------------------------------- expander
def expand(root, regex_map, replace_map):
    """Yield one list of terminal tokens per grammar production.

    Semantics mirror the reference generator's left-to-right expansion:
    the history carries the name of EVERY element entered so far in the
    production (ancestors and already-expanded preceding elements), so
    a Regex terminal resolves through regex_map[regex name] by the
    most recently entered mapped name — typically the keyword right
    before it (e.g. `k_user "USER"`). replace_map prunes productions;
    an unmapped regex terminal prunes; Prio keeps only non-recursive
    alternatives; Repeat/List expand to one element (plus the empty
    form when min == 0), the itest's default_list_n = 1.
    """

    def options(e, hist):
        """Replacement splices for one element (None = prune all)."""
        if isinstance(e, Keyword):
            return [[e._keyword]]
        if isinstance(e, Token):
            return [[e._token]]
        if isinstance(e, Tokens):
            return [[t] for t in e._tokens]
        if isinstance(e, Regex):
            re_map = regex_map.get(getattr(e, 'name', None), {})
            for ename in reversed(hist):
                if ename in re_map:
                    return [[re_map[ename]]]
            return []  # unmapped regex terminal → prune
        if isinstance(e, Sequence):
            return [list(e._elements)]
        if isinstance(e, Choice):
            return [[x] for x in e._elements]
        if isinstance(e, Optional):
            return [[], [e._elements[0]]]
        if isinstance(e, (Repeat, List)):
            outs = [] if e._min != 0 else [[]]
            outs.append([e._elements[0]])
            return outs
        if isinstance(e, (Rule, Prio)):
            # a raw Prio appears when referenced before the metaclass
            # wrapped its class attribute in Rule; same semantics
            alts = (e._element._elements if isinstance(e, Rule)
                    else e._elements)
            return [[a] for a in alts
                    if not (isinstance(a, Sequence) and any(
                        isinstance(x, This) for x in a._elements))]
        if isinstance(e, (Ref, This)):
            return []
        raise AssertionError(f'unhandled element {type(e)}')

    def walk(q, hist):
        for i, e in enumerate(q):
            if isinstance(e, (str, int, float)):
                continue
            name = getattr(e, 'name', None)
            if name is not None and name in replace_map:
                return  # pruned production
            hist2 = hist + (name,) if name is not None else hist
            for repl in options(e, hist2):
                yield from walk(q[:i] + repl + q[i + 1:], hist2)
            return
        yield q

    yield from walk([root], ())


# k_map.py values (terminal placeholders), verbatim
K_MAP = {
    'r_doubleq_str': {
        'k_as': '"MERGED"', 'k_suffix': '"SUFFIX"', 'k_prefix': '"PREFIX"',
        'series_name': '"000000"', 'k_filter': 10,
        'uuid': '"koos-VirtualBox:9010"', 'k_name': '"000000"',
        'k_user': '"USER"', 'k_password': '"PASSWORD"',
        'k_status': '"running"', 'k_expression': '"/.*/"',
        'k_address': '"localhost"', 'k_buffer_path': '"BUFFER_PATH"',
        'k_dbpath': '"DBPATH"', 'k_uuid': '"UUID"', 'k_version': '"VERSION"',
        'k_reindex_progress': '"REINDEX_PROGRESS"',
        'k_sync_progress': '"SYNC_PROGRESS"', 'k_timezone': '"NAIVE"',
        'k_ip_support': '"ALL"', 'k_libuv': '"1.8.0"', 'k_server': '"SERVER"',
        'k_tee_pipe_name': '"PIPENAME"', 'k_shard_duration': 86400,
        'k_expiration_num': 0, 'k_expiration_log': 0,
        'aggregate_functions': '"1970-1-1 1:00:10"',
        'k_start': '"1970-1-1 1:00:00"', 'k_after': '"1970-1-1 1:00:00"',
        'k_between': '"1970-1-1 1:00:00"', 'k_before': '"1970-1-1 1:01:00"',
        'k_and': '"1970-1-1 1:01:00"', 'k_end': '"1970-1-1 1:01:00"',
    },
    'r_integer': {
        'k_series': 0, 'k_active_handles': 0, 'k_buffer_size': 0,
        'k_port': 9000, 'k_startup_time': 0, 'k_max_open_files': 0,
        'k_mem_usage': 0, 'k_open_files': 0, 'k_received_points': 0,
        'k_uptime': 0, 'k_servers': 0, 'k_limit': 10, 'k_sid': 0,
        'k_pool': 0, 'k_filter': 10, 'k_size': 10, 'k_length': 10,
        'aggregate_functions': 10, 'k_start': 0, 'k_after': 0,
        'k_between': 0, 'k_before': 60, 'k_and': 60, 'k_end': 60,
        'k_shard_duration': 86400, 'k_expiration_num': 0,
        'k_expiration_log': 0,
    },
    'r_float': {'k_filter': 10.0, 'k_drop_threshold': 0.99},
    'r_time_str': {
        'aggregate_functions': '10s', 'k_start': '0d', 'k_after': '0d',
        'k_between': '0d', 'k_before': '1m', 'k_and': '1m', 'k_end': '1m',
        'k_shard_duration': '1d', 'k_expiration_num': '0d',
        'k_expiration_log': '0d',
    },
    'r_uuid_str': {'r_uuid_str': '"UUID"'},
    'r_uinteger': {'k_port': 9000, 'k_list_limit': 10000,
                   'k_select_points_limit': 1000000},
    'r_grave_str': {
        'group_name': '`GROUP`', 'tag_name': '`TAG`',
        'group_tag_match': '`GROUP_OR_TAG`',
    },
    'r_regex': {'r_regex': '/.*/'},
    'r_comment': {'r_comment': '#'},
}

# per-entry replace maps, mirroring test_grammar.py
ENTRIES = {
    'create_stmt': {'r_singleq_str'},
    'select_stmt': {'r_singleq_str', 'k_filter', 'k_prefix', 'k_suffix',
                    'k_merge', 'k_where', 'after_expr', 'before_expr',
                    'between_expr'},
    'revoke_stmt': {'r_singleq_str'},
    'grant_stmt': {'r_singleq_str'},
    'alter_stmt': {'r_singleq_str', 'k_now', 'set_name', 'set_address',
                   'set_port', 'set_timezone', 'set_log_level'},
    'count_stmt': {'r_singleq_str'},
    'list_stmt': {'r_singleq_str'},
    'drop_stmt': {'r_singleq_str', 'drop_server'},
    'show_stmt': {'r_singleq_str'},
    'calc_stmt': {'r_singleq_str'},
}


def main():
    _install_shim()
    os.chdir('/root/reference/grammar')  # siridbhelp lists ../help
    sys.path.insert(0, '.')
    from grammar import SiriGrammar
    out = []
    for entry, repl in ENTRIES.items():
        ele = getattr(SiriGrammar, entry)
        qs = sorted(set(
            ' '.join(str(t) for t in toks).strip()
            for toks in expand(ele, K_MAP, repl)))
        print(f'{entry}: {len(qs)} productions', file=sys.stderr)
        out.extend(qs)
    dst = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       '..', 'src', 'test', 'resources',
                       'grammar_corpus.txt')
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    with open(dst, 'w') as f:
        f.write('\n'.join(out) + '\n')
    print(f'{len(out)} total → {dst}', file=sys.stderr)


if __name__ == '__main__':
    main()
