"""Language-semantics pinning for the jsrt JavaScript interpreter.

jsrt (tools/jsrt) executes the shipped frontend in CI; these tests pin
the ES2020-subset semantics it must model faithfully — each case is a
construct app.js / tex.js actually uses. The app-level flows live in
test_frontend_dom.py; this file is the interpreter's own contract.
"""

import math
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from jsrt import Interpreter, JSException  # noqa: E402
from jsrt.builtins import js_to_py  # noqa: E402
from jsrt.interp import UNDEF  # noqa: E402


@pytest.fixture()
def interp():
    return Interpreter()


def run(i, src):
    return js_to_py(i.run(src))


# ---------------------------------------------------------------------------
# core language


def test_arithmetic_and_strings(interp):
    assert run(interp, "1 + 2 * 3") == 7
    assert run(interp, "'a' + 1 + 2") == "a12"
    assert run(interp, "1 + 2 + 'a'") == "3a"
    assert run(interp, "7 % 3") == 1
    assert run(interp, "2 ** 10") == 1024
    assert run(interp, "(5 / 2) | 0") == 2
    assert run(interp, "(-1) >>> 0") == 4294967295
    assert run(interp, "'5' * '4'") == 20


def test_equality_and_truthiness(interp):
    assert run(interp, "null == undefined") is True
    assert run(interp, "null === undefined") is False
    assert run(interp, "0 == ''") is True
    assert run(interp, "0 === ''") is False
    assert run(interp, "NaN === NaN") is False
    assert run(interp, "!!''") is False
    assert run(interp, "!!'x'") is True
    assert run(interp, "!!0") is False
    assert run(interp, "!!NaN") is False
    assert run(interp, "[] === []") is False  # reference identity


def test_closures_and_hoisting(interp):
    assert run(interp, """
        function counter() {
          let n = 0;
          return () => ++n;
        }
        const c = counter();
        c(); c();
        c();
    """) == 3
    # function declarations hoist within their scope
    assert run(interp, "whoami(); function whoami() { return 'me'; }"
               " whoami()") == "me"


def test_template_literals_nested(interp):
    assert run(interp, "const x = 2; `a${x}b${`c${x * 2}`}d`") == "a2bc4d"


def test_destructuring_and_defaults(interp):
    assert run(interp, """
        const { a, b = 5, c: renamed } = { a: 1, c: 3 };
        const [x, , z = 9] = [10, 20];
        a + b + renamed + x + z;
    """) == 28
    # parameter object-destructuring with defaults (the _dialog signature)
    assert run(interp, """
        function f(msg, { input = null, danger = false } = {}) {
          return [msg, input, danger];
        }
        JSON.stringify([f('a'), f('b', { input: 'x' })]);
    """) == '[["a",null,false],["b","x",false]]'


def test_spread_and_rest(interp):
    assert run(interp, "Math.min(...[3, 1, 2])") == 1
    assert run(interp, "const o = {a: 1, ...{b: 2}, c: 3};"
               "JSON.stringify(o)") == '{"a":1,"b":2,"c":3}'
    assert run(interp, "function f(a, ...rest) { return rest.length; }"
               "f(1, 2, 3, 4)") == 3


def test_optional_chaining_and_nullish(interp):
    assert run(interp, "const o = {a: {b: [7]}}; o.a?.b?.[0]") == 7
    assert run(interp, "const o = {}; o.a?.b?.[0] === undefined") is True
    assert run(interp, "const o = {}; o.missing?.fn()") is None  # undefined
    assert run(interp, "null ?? 'fallback'") == "fallback"
    assert run(interp, "0 ?? 'fallback'") == 0  # nullish, not falsy
    assert run(interp, "'' ?? 'fallback'") == ""


def test_classes_this_binding(interp):
    assert run(interp, """
        class Acc {
          constructor(start) { this.total = start; }
          add(x) { this.total += x; return this; }
          get() { return this.total; }
        }
        new Acc(10).add(5).add(7).get();
    """) == 22


def test_arrow_this_lexical(interp):
    assert run(interp, """
        class T {
          constructor() { this.v = 42; }
          run() {
            const get = () => this.v;
            return get();
          }
        }
        new T().run();
    """) == 42


def test_try_catch_finally_ordering(interp):
    assert run(interp, """
        const log = [];
        function f() {
          try { throw new Error('x'); }
          catch (e) { log.push('catch:' + e.message); return 'ret'; }
          finally { log.push('finally'); }
        }
        log.push(f());
        JSON.stringify(log);
    """) == '["catch:x","finally","ret"]'


def test_loops_break_continue(interp):
    assert run(interp, """
        let s = 0;
        for (let i = 0; i < 10; i++) {
          if (i === 3) continue;
          if (i === 6) break;
          s += i;
        }
        for (const v of [100, 200]) s += v;
        let j = 0;
        while (j < 3) j++;
        do { j++; } while (false);
        s + j;
    """) == 0 + 1 + 2 + 4 + 5 + 300 + 4


def test_switchless_subset_rejects_unsupported(interp):
    with pytest.raises(SyntaxError):
        interp.run("switch (1) { case 1: break; }")
    with pytest.raises(SyntaxError):
        interp.run("class A extends B {}")
    with pytest.raises(SyntaxError):
        interp.run("function* gen() { yield 1; }")


# ---------------------------------------------------------------------------
# regex semantics (the highlighter/markdown pipeline depends on these)


def test_regex_stateful_global_exec(interp):
    assert run(interp, """
        const re = /(\\d+)/g;
        const out = [];
        let m;
        while ((m = re.exec('a1b22c333'))) out.push(m.index + ':' + m[1]);
        out.join(',');
    """) == "1:1,3:22,6:333"


def test_regex_replace_with_callback_and_groups(interp):
    assert run(interp, """
        'hello [a](u1) and [b](u2)'.replace(
            /\\[([^\\]]+)\\]\\(([^)\\s]+)\\)/g,
            (m, t, u) => `<a href="${u}">${t}</a>`);
    """) == 'hello <a href="u1">a</a> and <a href="u2">b</a>'


def test_regex_replace_dollar_templates(interp):
    assert run(interp, "'a_b_c'.replace(/_/g, '-')") == "a-b-c"
    assert run(interp, "'**bold**'.replace(/\\*\\*([^*]+)\\*\\*/g,"
               "'<strong>$1</strong>')") == "<strong>bold</strong>"


def test_regex_split_and_match(interp):
    assert run(interp, "JSON.stringify('a```b```c'.split(/```/))") == \
        '["a","b","c"]'
    assert run(interp, "('# title'.match(/^(#{1,6})\\s+(.*)$/))[1]") == "#"
    assert run(interp, "'xyz'.match(/(\\d+)/) === null") is True
    assert run(interp, "JSON.stringify('a1 b22'.match(/\\d+/g))") == \
        '["1","22"]'


def test_regex_non_participating_group_is_undefined(interp):
    assert run(interp, "('ab'.match(/(a)(x)?(b)/))[2] === undefined") is True


# ---------------------------------------------------------------------------
# builtins


def test_string_methods(interp):
    assert run(interp, "'  pad  '.trim()") == "pad"
    assert run(interp, "'AbC'.toLowerCase() + 'x'.toUpperCase()") == "abcX"
    assert run(interp, "'hello'.slice(1, 3)") == "el"
    assert run(interp, "'hello'.slice(-2)") == "lo"
    assert run(interp, "'a,b,,c'.split(',').length") == 4
    assert run(interp, "'abc'.charCodeAt(1)") == 98
    assert run(interp, "String.fromCharCode(104, 105)") == "hi"
    assert run(interp, "'abc'.includes('b')") is True
    assert run(interp, "'[SourcesMap]: x'.startsWith('[SourcesMap]:')") \
        is True
    assert run(interp, "'abcabc'.lastIndexOf('b')") == 4
    assert run(interp, "String(42.5)") == "42.5"
    assert run(interp, "String(7)") == "7"  # integral floats print as ints


def test_array_methods(interp):
    assert run(interp, "[3, 1, 2].map(x => x * 2).join('-')") == "6-2-4"
    assert run(interp, "[1, 2, 3, 4].filter(x => x % 2).length") == 2
    assert run(interp, "[{id: 'a'}, {id: 'b'}].find(m => m.id === 'b').id"
               ) == "b"
    assert run(interp, """
        const buf = [1, 2, 3];
        buf.length = 0;  // the flushPara idiom
        buf.push(9);
        JSON.stringify(buf);
    """) == "[9]"
    assert run(interp, "[1, [2, [3]]].flat(2).join(',')") == "1,2,3"
    assert run(interp, "[1, 2, 3].reduce((a, b) => a + b, 10)") == 16
    assert run(interp, "Array.isArray([])") is True
    assert run(interp, "Array.isArray({})") is False


def test_set_semantics(interp):
    assert run(interp, """
        const s = new Set(['py', 'sh']);
        s.add('rb');
        JSON.stringify([s.has('py'), s.has('js'), s.size]);
    """) == '[true,false,3]'


def test_json_roundtrip(interp):
    assert run(interp, """
        const o = JSON.parse('{"a": [1, null, "x"], "b": {"c": true}}');
        JSON.stringify(o);
    """) == '{"a":[1,null,"x"],"b":{"c":true}}'
    # parse failure throws a catchable SyntaxError (the SourcesMap guard)
    assert run(interp, """
        let ok = 'caught-nothing';
        try { JSON.parse('{bad'); } catch (e) { ok = e.name; }
        ok;
    """) == "SyntaxError"
    assert run(interp, "JSON.stringify({u: undefined, f: 1})") == '{"f":1}'


def test_number_parsing(interp):
    assert run(interp, "parseInt('42px')") == 42
    assert run(interp, "parseFloat('0.7')") == 0.7
    assert run(interp, "parseInt('edit-7'.slice(5), 10)") == 7
    assert math.isnan(interp.run("parseInt('nope')"))
    assert run(interp, "Math.round(0.845 * 100)") == 85
    assert run(interp, "Math.min(150, 200)") == 150


# ---------------------------------------------------------------------------
# async / promises / timers (virtual clock)


def test_async_await_ordering(interp):
    interp.run("""
        const log = [];
        async function main() {
          log.push('a');
          await Promise.resolve();
          log.push('c');
        }
        main();
        log.push('b');
    """)
    interp.run_jobs()
    assert js_to_py(interp.run("JSON.stringify(log)")) == '["a","b","c"]'


def test_async_rejection_caught(interp):
    interp.run("""
        let result = null;
        async function f() {
          try { await Promise.reject(new Error('boom')); }
          catch (e) { result = 'caught ' + e.message; }
        }
        f();
    """)
    interp.run_jobs()
    assert interp.run("result") == "caught boom"


def test_timers_virtual_clock(interp):
    interp.run("""
        const fired = [];
        setTimeout(() => fired.push('t100'), 100);
        const iv = setInterval(() => {
          fired.push('i50');
          if (fired.filter(x => x === 'i50').length >= 2)
            clearInterval(iv);
        }, 50);
    """)
    interp.advance_time(40)
    assert js_to_py(interp.run("fired.length")) == 0
    interp.advance_time(80)  # t=120: i50@50, i50@100 (cleared), t100@100
    assert js_to_py(interp.run("JSON.stringify(fired)")) == \
        '["i50","t100","i50"]' or \
        js_to_py(interp.run("JSON.stringify(fired)")) == \
        '["i50","i50","t100"]'


def test_promise_chain_then(interp):
    interp.run("""
        let out = 0;
        new Promise((resolve) => resolve(5))
          .then(v => v * 2)
          .then(v => { out = v; });
    """)
    interp.run_jobs()
    assert js_to_py(interp.run("out")) == 10


def test_uncaught_js_exception_surfaces_to_host(interp):
    with pytest.raises(JSException):
        interp.run("null.foo")
    with pytest.raises(JSException):
        interp.run("undefinedName()")


def test_undefined_vs_null_distinct(interp):
    assert interp.run("null") is None
    assert interp.run("undefined") is UNDEF
    assert run(interp, "'x'.match(/y/) === null") is True


def test_date_subset_is_deterministic(interp):
    """Date: string/epoch parsing, accessors, fixed-instant now()
    (CI determinism policy, like Math.random)."""
    out = run(
        interp,
        "JSON.stringify(["
        "  new Date('2026-08-17 10:30:05Z').getTime(),"
        "  new Date('2026-08-17T10:30:05Z').getTime(),"
        "  new Date(0).getFullYear(),"
        "  isNaN(new Date('not a date').getTime()),"
        "  new Date('2026-08-17T10:30:05Z').toLocaleString([],"
        "    {month:'short',day:'numeric',hour:'2-digit',minute:'2-digit'}),"
        "  Date.now() === new Date().getTime(),"
        "])"
    )
    import json as _json

    vals = _json.loads(out)
    assert vals[0] == vals[1] == 1786962605000
    assert vals[2] == 1970
    assert vals[3] is True
    assert vals[4] == "Aug 17, 10:30"
    assert vals[5] is True


def test_date_out_of_range_is_invalid_not_crash(interp):
    """JS clips |ms| > 8.64e15 to Invalid Date; Python range errors must
    not escape as host crashes."""
    assert run(interp, "isNaN(new Date(1e18).getTime())") is True
    assert run(interp, "isNaN(new Date(-1e15).getTime())") is True
    assert run(interp, "new Date(1e18).toLocaleString()") == "Invalid Date"


def test_reference_evaluated_once_for_update_and_compound(interp):
    """arr[i++] += / ++ must evaluate the index expression ONCE —
    double evaluation advanced side effects twice and wrote a different
    slot than it read."""
    out = run(interp, """
      (() => {
        const arr = [10, 20, 30];
        let i = 0;
        arr[i++] += 1;          // reads and writes arr[0]; i ends at 1
        let calls = 0;
        const f = () => { calls++; return 2; };
        arr[f()]++;             // f called once
        return JSON.stringify([arr, i, calls]);
      })()
    """)
    import json as _json

    arr, i, calls = _json.loads(out)
    assert arr == [11, 20, 31]
    assert i == 1 and calls == 1


def test_array_negative_index_write_is_ignored(interp):
    out = run(interp, """
      (() => {
        const a = [1, 2, 3];
        a[-1] = 99;             // must NOT clobber a[2]
        const b = [];
        b[-1] = 5;              // must not crash on empty
        return JSON.stringify([a, b.length]);
      })()
    """)
    assert out == "[[1,2,3],0]"


def test_math_domain_edges_return_js_values(interp):
    assert run(interp, "isNaN(Math.floor(NaN))") is True
    assert run(interp, "Math.floor(Infinity)") == float("inf")
    assert run(interp, "isNaN(Math.sqrt(-1))") is True
    assert run(interp, "Math.trunc(-Infinity)") == float("-inf")


def test_splice_clamps_count(interp):
    out = run(interp, """
      (() => {
        const a = [1, 2, 3, 4];
        const r1 = a.splice(1, undefined); // JS: deletes 0
        const r2 = a.splice(0, -2);        // JS: deletes 0
        const r3 = a.splice(1, 99);        // clamps to rest
        return JSON.stringify([a, r1, r2, r3]);
      })()
    """)
    assert out == "[[1],[],[],[2,3,4]]"


def test_error_subtypes_are_instanceof_error(interp):
    assert run(interp, "(new TypeError('x')) instanceof Error") is True
    assert run(interp, "(new TypeError('x')) instanceof TypeError") is True
    assert run(interp, "(new Error('x')) instanceof TypeError") is False
    # interpreter-raised TypeErrors too
    assert run(interp, """
      (() => { try { null.x; } catch (e) { return e instanceof Error; } })()
    """) is True


def test_set_map_samevaluezero_keys(interp):
    assert run(interp, "new Set([1, true]).size") == 2
    assert run(interp, "new Set([NaN, NaN, 0/0]).size") == 1
    assert run(interp, """
      (() => { const m = new Map(); m.set(true, 'a'); 
               return m.get(1) === undefined; })()
    """) is True


def test_set_add_normalizes_negative_zero(interp):
    """Set.prototype.add stores -0 as +0 (spec step "If value is -0F,
    set value to +0F") — observable through iteration. A first-insert-
    wins implementation kept -0, diverging from Node exactly on the
    only SameValueZero pair with distinct observable values."""
    assert run(interp, "1 / [...new Set([-0, 0])][0]") == float("inf")
    assert run(interp, "1 / [...new Set([-0])][0]") == float("inf")
    assert run(interp, "new Set([-0, 0]).size") == 1
    assert run(interp, """
      (() => { const s = new Set(); s.add(-0);
               let got = null; s.forEach(v => got = 1 / v); return got; })()
    """) == float("inf")


def test_set_iteration_yields_values_not_tag_tuples(interp):
    """The SameValueZero key tags are an implementation detail: for-of,
    spread, and forEach over a Set must yield the ORIGINAL values (a
    regression stored only ('n', 1.0)-style tag tuples, so arithmetic
    over iterated members produced garbage)."""
    assert run(interp, """
      (() => { let t = 0; new Set([1, 2, 3]).forEach(x => t += x);
               return t; })()
    """) == 6
    assert run(interp, """
      (() => { let out = []; for (const v of new Set(['a', 'b'])) out.push(v);
               return out.join(''); })()
    """) == "ab"
    assert run(interp, "[...new Set([4, 5])].reduce((a, b) => a + b, 0)") == 9
    # object members round-trip as the objects themselves, not id() ints
    assert run(interp, """
      (() => { const o = {k: 7}; const s = new Set(); s.add(o);
               let got = 0; s.forEach(x => got = x.k); return got; })()
    """) == 7
    # delete returns true/false correctly after the value-storing change
    assert run(interp, """
      (() => { const s = new Set([1]); 
               return JSON.stringify([s.delete(1), s.delete(1)]); })()
    """) == "[true,false]"


def test_logical_assignment_reference_evaluated_once(interp):
    """a[i++] ||= v (and &&=, ??=) must evaluate the index ONCE — the
    read/write split re-ran side effects and wrote a different slot
    than it read."""
    import json as _json

    out = run(interp, """
      (() => {
        const a = [0, 5, undefined];
        let i = 0;
        a[i++] ||= 9;            // falsy: writes a[0], i ends 1
        let calls = 0;
        const f = () => { calls++; return 1; };
        a[f()] &&= 6;            // truthy: writes a[1], f called once
        let calls2 = 0;
        const g = () => { calls2++; return 2; };
        a[g()] ??= 7;            // nullish: writes a[2], g called once
        return JSON.stringify([a, i, calls, calls2]);
      })()
    """)
    arr, i, calls, calls2 = _json.loads(out)
    assert arr == [9, 6, 7]
    assert i == 1 and calls == 1 and calls2 == 1
