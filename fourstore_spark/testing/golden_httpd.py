"""Replay of the reference's OWN end-to-end HTTP protocol tests.

The reference's second golden harness (tests/httpd/run.pl) runs every
script in tests/httpd/scripts/* against a live 4s-httpd and byte-diffs
stdout against exemplar/<name>.  The scripts speak through sparql.sh's
helpers; this module replays them against THIS engine's live
SparqlHttpServer over real HTTP:

- ``sparql EPR 'Q' [extra]`` — GET /sparql/?query=...  with
  ``Accept: text/plain`` (the reference's output_text ascii tables,
  served here by results_io.select_text), echoing ``Query: <raw>``;
- ``update EPR 'U'``       — POST /update/ (echoes ``Update: <raw>``);
- ``put/put-old``          — PUT /data/?graph= / /data/<graph> of a data
  file with an explicit Content-Type;
- ``post``                 — POST /data/ form (data/mime-type/graph);
- ``delete/delete-old``    — DELETE /data/?graph= / /data/<graph>;
- raw ``curl`` invocations (the CORS scripts) — replayed as real
  GET/HEAD/OPTIONS requests, grepping response HEADERS like the script.

Escaping fidelity: sparql.sh's uriescape percent-encodes by sed and
backslash-escapes curl glob characters; the NET bytes the server decodes
are the query text with newlines flattened to spaces and every ``&``
turned into ``8`` (the sed writes %38, which IS the digit 8 — a faithful
bug-for-bug quirk of the reference harness; no checked-in script trips
it).  ``_net_query`` reproduces exactly that.

Version tokens in response bodies are normalized by the same sed the
scripts apply (`` v<digits>...`` -> `` [VERSION]``).
"""

from __future__ import annotations

import os
import re
import urllib.parse
import urllib.request
from dataclasses import dataclass, field

REF_HTTPD_DIR = "/root/reference/tests/httpd"
# the ACL suite (tests/httpd-extras/run.pl starts 4s-httpd with -A):
# same sparql.sh helpers plus apikey-carrying variants (sparqlkey,
# updatekey, putkey, deletekey)
REF_HTTPD_EXTRAS_DIR = "/root/reference/tests/httpd-extras"
REF_DATA_DIR = "/root/reference/data"

_VER_QUERY = re.compile(r" v[0-9]\.[.0-9a-z-]*")  # sparql() sed
_VER_ANY = re.compile(r" v[.0-9a-z-]*")  # put/post/delete sed


def _sed_version(body: str, pat: re.Pattern) -> str:
    """sed 's/PAT/ [VERSION]/' — no /g: FIRST occurrence on EACH line
    (the r6 whole-body count=1 under-replaced multi-line bodies)."""
    return "\n".join(pat.sub(" [VERSION]", ln, count=1)
                     for ln in body.split("\n"))


def _net_query(q: str) -> str:
    """The bytes the server decodes from a uriescape'd query."""
    return q.replace("\n", " ").replace("\r", " ").replace("&", "8")


@dataclass
class Step:
    kind: str  # sparql | update | put | post | delete | curl | echo
    text: str = ""
    extra: str = ""  # raw extra cgi for sparql ('&soft-limit=-1')
    path: str = ""  # data file for put
    mime: str = ""
    graph: str = ""
    old_style: bool = False  # /data/<graph> vs /data/?graph=
    method: str = ""  # for curl steps
    headers: dict = field(default_factory=dict)
    grep: str = ""  # egrep -i pattern over response headers
    apikey: str = ""  # *key helper variants (httpd-extras ACL suite)


@dataclass
class Script:
    name: str
    steps: list[Step] = field(default_factory=list)
    unsupported: str | None = None


def _run_for_block(lines: list[str], i: int, env: dict, files: dict) -> int:
    """Interpret a bash ``for VAR in a b c; do ... done`` block whose
    body is echo-append data generation (describe's 5200-line TTL
    build) or a nested for. Returns the index just past ``done``."""
    head = lines[i].strip().rstrip(";")
    m = re.match(r"for\s+(\w+)\s+in\s+(.*?);?\s*do$", head)
    if not m:
        raise ValueError(f"unparsed for: {head[:60]!r}")
    var, tokens = m.group(1), m.group(2).split()
    # collect body lines up to the MATCHING done
    body_start = i + 1
    depth = 1
    j = body_start
    while j < len(lines):
        s = lines[j].strip()
        if re.match(r"for\s+\w+\s+in\s", s):
            depth += 1
        elif s.rstrip(";") == "done":
            depth -= 1
            if depth == 0:
                break
        j += 1
    if depth != 0:
        raise ValueError("for without done")
    body = lines[body_start:j]

    def run_body_rec(blines: list[str], env2: dict) -> None:
        k = 0
        while k < len(blines):
            s = blines[k].strip()
            if not s:
                k += 1
                continue
            if re.match(r"for\s+\w+\s+in\s", s):
                k = _run_for_block(blines, k, env2, files)
                continue
            em = re.match(r'echo\s+"(.*)"\s*>>\s*\$(\w+);?$', s)
            if not em:
                raise ValueError(f"unparsed loop body: {s[:60]!r}")
            text, fvar = em.group(1), em.group(2)
            text = re.sub(
                r"\$\{(\w+)\}|\$(\w+)",
                lambda mm: env2.get(mm.group(1) or mm.group(2), ""),
                text,
            )
            text = text.replace('\\"', '"').replace("\\\\", "\\")
            files.setdefault(fvar, []).append(text)
            k += 1

    for tok in tokens:
        env[var] = tok
        run_body_rec(body, env)
    return j + 1


_SQ = re.compile(r"'([^']*)'", re.S)


def _args(cmd: str) -> list[str]:
    """Split a helper invocation into arguments (single- or double-
    quoted spans or bare words). Double-quoted spans lose their
    backslashes the way bash does for \\<newline> continuations (the
    join already replaced those with spaces)."""
    out = []
    for m in re.finditer(r"'([^']*)'|\"([^\"]*)\"|(\S+)", cmd):
        if m.group(1) is not None:
            out.append(m.group(1))
        elif m.group(2) is not None:
            out.append(m.group(2))
        else:
            out.append(m.group(3))
    return out


def parse_script(path: str) -> Script:
    sc = Script(name=os.path.basename(path))
    with open(path) as fh:
        body = fh.read()
    # join backslash-continued lines the way bash does: backslash-newline
    # vanishes ENTIRELY — the next line's leading whitespace survives
    # into the string (number-comparison's exemplar echoes "{     GRAPH")
    body = re.sub(r"\\\n", "", body)
    tmpfile_empty = False
    gen_files: dict[str, list[str]] = {}  # mktemp var -> echoed lines
    shellvars: dict[str, str] = {}  # VAR="literal" assignments

    def _sub(arg: str) -> str:
        """$VAR reference -> its assigned literal (the extras scripts
        pass apikeys as $adminkey / $user1 / ...)."""
        if arg.startswith("$") and arg[1:] in shellvars:
            return shellvars[arg[1:]]
        return arg

    lines = body.split("\n")
    i = 0
    while i < len(lines):
        ln = lines[i].strip()
        i += 1
        if (
            not ln
            or ln.startswith("#")
            or ln.startswith("source ")
            or ln.startswith("pkg-config")
            or ln.startswith("uriescape ")
        ):
            continue
        if ln.startswith("TEMPFILE=") or ln == "touch $TEMPFILE" or ln.startswith("rm "):
            tmpfile_empty = ln != "rm $TEMPFILE" or tmpfile_empty
            continue
        # plain VAR="literal" assignment (extras scripts' apikeys)
        am = re.match(r'(\w+)="([^"`$]*)"\s*$', ln)
        if am:
            shellvars[am.group(1)] = am.group(2)
            continue
        # file=`mktemp ...`: start an in-memory generated data file
        fm = re.match(r"(\w+)=`mktemp\b", ln)
        if fm:
            gen_files[fm.group(1)] = []
            continue
        if re.match(r"for\s+\w+\s+in\s", ln):
            # data-generation loop (describe): execute at parse time
            try:
                i = _run_for_block(lines, i - 1, {}, gen_files)
            except ValueError as exc:
                sc.unsupported = str(exc)
                return sc
            continue
        # VAR=`sparql "$EPR" '...' | pipeline`: run-time capture
        cm = re.match(
            r"(\w+)=`sparql\s+\"\$EPR\"\s+'([^']*)'\s*\|\s*(.+)`\s*$", ln
        )
        if cm:
            sc.steps.append(
                Step(kind="capture", graph=cm.group(1), text=cm.group(2),
                     extra=cm.group(3))
            )
            continue
        # if [ $VAR = VALUE ] / then / echo A / else / echo B / fi
        im = re.match(r"if\s+\[\s+\$(\w+)\s+=\s+(\S+)\s+\]", ln)
        if im:
            block = [ln]
            while i < len(lines) and lines[i].strip() != "fi":
                block.append(lines[i].strip())
                i += 1
            i += 1  # past fi
            texts = re.findall(r'echo\s+"([^"]*)"', "\n".join(block))
            has_else = any(b == "else" for b in block)
            if len(texts) != (2 if has_else else 1):
                sc.unsupported = f"unparsed if block: {block!r}"
                return sc
            sc.steps.append(
                Step(kind="cond_echo", graph=im.group(1), mime=im.group(2),
                     text=texts[0], extra=texts[1] if has_else else "")
            )
            continue
        # multi-line single-quoted argument: accumulate
        while ln.count("'") % 2 == 1 and i < len(lines):
            ln += "\n" + lines[i]
            i += 1
        first = ln.split()[0] if ln.split() else ""
        if first == "sparqlkey":
            # sparql.sh sparqlkey: GET /sparql/?query=...&apikey=KEY;
            # its version sed is the broad ' v[.0-9a-z-]*' (unlike
            # sparql's digit-anchored one)
            a = [_sub(x) for x in _args(ln)]
            st = Step(kind="sparql", text=a[2], apikey=a[3])
            st.headers["__verany"] = "1"
            sc.steps.append(st)
        elif first == "updatekey":
            a = [_sub(x) for x in _args(ln)]
            sc.steps.append(Step(kind="update", text=a[2], apikey=a[3]))
        elif first == "putkey":
            a = [_sub(x) for x in _args(ln)]  # [.., file, mime, graph, key]
            fpath = a[2].replace("../../data", REF_DATA_DIR)
            sc.steps.append(
                Step(kind="put", path=fpath, mime=a[3], graph=a[4],
                     apikey=a[5])
            )
        elif first == "deletekey":
            a = [_sub(x) for x in _args(ln)]
            sc.steps.append(Step(kind="delete", graph=a[2], apikey=a[3]))
        elif first == "sparql":
            # strip a trailing shell pipeline BEFORE arg-splitting: the
            # bare "|"/"sed" tokens would otherwise leak into the extra
            # cgi slot and corrupt the request URL
            pipe_sort = False
            sed_expr = None
            mp = re.search(r"\|\s*sort\s*$", ln)
            if mp:
                pipe_sort = True
                ln = ln[: mp.start()]
            ms = re.search(r"\|\s*sed\s+[\"'](s/.*/.*?/)[\"']\s*$", ln, re.S)
            if ms:
                sed_expr = ms.group(1)
                ln = ln[: ms.start()]
            a = _args(ln)  # [sparql, $EPR, query, extra?]
            st = Step(kind="sparql", text=a[2])
            if len(a) > 3 and a[3].startswith("&"):
                st.extra = a[3]
            st.headers["__sort"] = "1" if pipe_sort else ""
            if sed_expr:
                st.headers["__sed"] = sed_expr
            sc.steps.append(st)
        elif first == "update":
            a = _args(ln)
            sc.steps.append(Step(kind="update", text=a[2]))
        elif first in ("put", "put-old"):
            a = _args(ln)  # [put, $EPR, file, mime, graph]
            fpath = a[2].strip('"')  # put "$EPR" "$TEMPFILE" ... quotes
            fpath = fpath.replace("$TESTPATH", REF_HTTPD_DIR)
            fpath = fpath.replace("../../data", REF_DATA_DIR)
            if fpath == "$TEMPFILE":
                sc.steps.append(
                    Step(kind="put", text="", mime=a[3], graph=a[4],
                         old_style=first == "put-old")
                )
            elif fpath.startswith("$") and fpath[1:] in gen_files:
                # loop-generated data file: inline its content
                sc.steps.append(
                    Step(kind="put",
                         text="\n".join(gen_files[fpath[1:]]) + "\n",
                         path="__inline__", mime=a[3], graph=a[4],
                         old_style=first == "put-old")
                )
            elif fpath.startswith("$"):
                sc.unsupported = f"dynamic data file: {a[2]!r}"
                return sc
            else:
                sc.steps.append(
                    Step(kind="put", path=fpath, mime=a[3], graph=a[4],
                         old_style=first == "put-old")
                )
        elif first == "post":
            a = _args(ln)  # [post, $EPR, data, mime, graph]
            sc.steps.append(Step(kind="post", text=a[2], mime=a[3], graph=a[4]))
        elif first in ("delete", "delete-old"):
            a = _args(ln)
            sc.steps.append(
                Step(kind="delete", graph=a[2], old_style=first == "delete-old")
            )
        elif first == "curl":
            st = Step(kind="curl", method="GET")
            if " -I " in ln + " " or re.search(r"\s-I\b", ln):
                st.method = "HEAD"
            m = re.search(r"-X\s+'?(\w+)'?", ln)
            if m:
                st.method = m.group(1)
            for hm in re.finditer(r'-H\s+"([^"]+)"', ln):
                k, _, v = hm.group(1).partition(":")
                st.headers[k.strip()] = v.strip()
            um = re.search(r'"\$EPR([^"]*)"', ln)
            if not um:
                sc.unsupported = f"unparsed curl: {ln[:60]!r}"
                return sc
            st.path = um.group(1)
            gm = re.search(r"egrep -i\s+\"([^\"]+)\"", ln)
            if gm:
                st.grep = gm.group(1)
            sc.steps.append(st)
        elif first == "echo":
            q = _SQ.search(ln) or re.search(r'"([^"]*)"', ln)
            sc.steps.append(Step(kind="echo", text=q.group(1) if q else ""))
        elif first in ("if", "then", "else", "fi") or re.match(
            r"\w+=`", ln
        ):
            sc.unsupported = f"shell control flow: {ln[:50]!r}"
            return sc
        else:
            sc.unsupported = f"unsupported command: {ln[:60]!r}"
            return sc
    return sc


# ------------------------------------------------------------ execution
def _http(base: str, method: str, path: str, headers: dict,
          body: bytes | None = None):
    req = urllib.request.Request(
        base + path, data=body, headers=headers, method=method
    )
    try:
        resp = urllib.request.urlopen(req)
        return resp.status, dict(resp.headers), resp.read().decode("utf-8")
    except urllib.error.HTTPError as e:  # error bodies matter too
        return e.code, dict(e.headers), e.read().decode("utf-8")


def run_script(base: str, sc: Script) -> str:
    out: list[str] = []
    env: dict[str, str] = {}  # VAR=`...` captures
    for st in sc.steps:
        if st.kind == "echo":
            out.append(st.text + "\n")
        elif st.kind == "capture":
            # VAR=`sparql "$EPR" 'Q' | tail -1 | grep -c "BRE"`: run the
            # query but capture instead of emitting; apply the pipeline
            q = _net_query(st.text)
            qs = urllib.parse.urlencode({"query": q})
            _, _, body = _http(
                base, "GET", f"/sparql/?{qs}", {"Accept": "text/plain"}
            )
            captured = f"Query: {st.text}\n" + body
            lines = captured.split("\n")
            if lines and lines[-1] == "":
                lines.pop()
            for stage in st.extra.split("|"):
                stage = stage.strip()
                tm = re.match(r"tail\s+-(\d+)$", stage)
                gm = re.match(r'grep\s+-c\s+"(.*)"$', stage)
                if tm:
                    lines = lines[-int(tm.group(1)):]
                elif gm:
                    pat = (gm.group(1)
                           .replace(r"\{", "{").replace(r"\}", "}")
                           .replace(r"\(", "(").replace(r"\)", ")"))
                    lines = [str(sum(1 for l in lines if re.search(pat, l)))]
                else:
                    raise ValueError(f"unsupported pipeline: {stage!r}")
            env[st.graph] = lines[-1] if lines else ""
        elif st.kind == "cond_echo":
            # if [ $VAR = VALUE ]; then echo A; else echo B; fi
            out.append(
                (st.text if env.get(st.graph) == st.mime else st.extra)
                + "\n"
            )
        elif st.kind == "sparql":
            q = _net_query(st.text)
            qs = urllib.parse.urlencode({"query": q})
            if st.apikey:
                qs += "&" + urllib.parse.urlencode({"apikey": st.apikey})
            extra = st.extra
            _, _, body = _http(
                base, "GET", f"/sparql/?{qs}{extra}",
                {"Accept": "text/plain"},
            )
            body = _sed_version(
                body,
                _VER_ANY if st.headers.get("__verany") else _VER_QUERY,
            )
            if st.headers.get("__sed"):
                # basic-regex sed like s/0\.[0-9]\{17\}e0/RANDOM_NUMBER/:
                # BRE escaped braces/parens -> python re, first
                # occurrence per line (no /g in any checked-in script)
                _, pat, repl = st.headers["__sed"].split("/")[:3]
                pat = (pat.replace(r"\{", "{").replace(r"\}", "}")
                          .replace(r"\(", "(").replace(r"\)", ")"))
                body = "\n".join(
                    re.sub(pat, repl.replace("\\", "\\\\"), ln_, count=1)
                    for ln_ in body.split("\n")
                )
            if st.headers.get("__sort"):
                # the script-level pipe sorts sparql()'s WHOLE stdout —
                # the echoed "Query:" line sorts WITH the payload
                lines = (f"Query: {st.text}\n" + body).split("\n")
                if lines and lines[-1] == "":
                    lines.pop()
                out.append("\n".join(sorted(lines)) + "\n")
            else:
                out.append(f"Query: {st.text}\n")
                out.append(body)
        elif st.kind == "update":
            out.append(f"Update: {st.text}\n")
            fields = {"update": st.text.replace("&", "8")}
            if st.apikey:
                fields["apikey"] = st.apikey
            form = urllib.parse.urlencode(fields)
            _, _, body = _http(
                base, "POST", "/update/",
                {"Content-Type": "application/x-www-form-urlencoded"},
                form.encode(),
            )
            out.append(_sed_version(body, _VER_ANY))
        elif st.kind == "put":
            data = b""
            if st.path == "__inline__":
                data = st.text.encode("utf-8")
            elif st.path:
                with open(st.path, "rb") as fh:
                    data = fh.read()
            if st.old_style:
                path = "/data/" + urllib.parse.quote(st.graph, safe="")
            else:
                fields = {"graph": st.graph}
                if st.apikey:
                    fields["apikey"] = st.apikey
                path = "/data/?" + urllib.parse.urlencode(fields)
            # sparql.sh's put passes the script's mime verbatim — an EMPTY
            # mime (badslot-construct) suppresses the header and the
            # server sniffs, like curl -H "Content-Type:" + raptor guess
            _, _, body = _http(
                base, "PUT", path, {"Content-Type": st.mime},
                data,
            )
            out.append(_sed_version(body, _VER_ANY))
        elif st.kind == "post":
            form = urllib.parse.urlencode(
                {"mime-type": st.mime, "graph": st.graph,
                 "data": st.text.replace("&", "8")}
            )
            _, _, body = _http(
                base, "POST", "/data/",
                {"Accept": "text/plain",
                 "Content-Type": "application/x-www-form-urlencoded"},
                form.encode(),
            )
            out.append(_sed_version(body, _VER_ANY))
        elif st.kind == "delete":
            if st.old_style:
                path = "/data/" + urllib.parse.quote(st.graph, safe="")
            else:
                fields = {"graph": st.graph}
                if st.apikey:
                    fields["apikey"] = st.apikey
                path = "/data/?" + urllib.parse.urlencode(fields)
            _, _, body = _http(base, "DELETE", path, {})
            out.append(_sed_version(body, _VER_ANY))
        elif st.kind == "curl":
            path = st.path.replace("$escaped", "")
            # the cors scripts interpolate $escaped from a prior
            # uriescape — recover it from the script text via st.text
            if st.text:
                path = st.path.replace(
                    "$escaped", urllib.parse.quote(_net_query(st.text))
                )
            code, headers, _ = _http(base, st.method, path, st.headers)
            if st.grep:
                pat = re.compile(st.grep, re.I)
                for k, v in headers.items():
                    line = f"{k}: {v}"
                    if pat.search(line):
                        out.append(line + "\n")
    return "".join(out)


_BN = re.compile(r"_:[A-Za-z0-9_]+")


# language tags compare case-insensitively (RDF Concepts §3.3; the
# reference itself is internally inconsistent: import.c:796 uppercases
# the stored tag while the update path hashes an uppercase COPY and
# keeps the original — its own exemplars mix "@EN-GB and "@fr)
_LANG = re.compile(r'(?<=")@([A-Za-z0-9-]+)')


def _norm_lang(text: str) -> str:
    return _LANG.sub(lambda m: "@" + m.group(1).lower(), text)


# a computed double prints as "<%f digits>e0"; past 17 significant
# digits Java's Formatter rounds to the shortest-repr decimal while C
# expands the exact binary value ("...770.000000" vs "...768.000000" —
# the SAME IEEE double). Compare those tokens by VALUE.
_DBL_TOKEN = re.compile(r"-?\d+\.\d+e0\b")


def _norm_dbl(text: str) -> str:
    return _DBL_TOKEN.sub(
        lambda m: repr(float(m.group(0)[:-2])) + "e0", text
    )


def compare_output(got: str, want: str) -> tuple[bool, str]:
    if got == want:
        return True, ""
    g = _norm_dbl(_norm_lang(_BN.sub("_:b", got)))
    w = _norm_dbl(_norm_lang(_BN.sub("_:b", want)))
    if g == w:
        return True, "normalized"
    if sorted(g.splitlines()) == sorted(w.splitlines()):
        return True, "line-multiset"
    import difflib

    diff = "\n".join(
        difflib.unified_diff(
            want.splitlines(), got.splitlines(),
            "exemplar", "engine", lineterm="", n=1,
        )
    )
    return False, diff[:2000]


def replay(
    base: str, name: str, suite_dir: str = REF_HTTPD_DIR
) -> tuple[str, str]:
    """-> (status, detail); status in pass|fail|skipped.  ``base`` is the
    live server's http://host:port. ``suite_dir`` selects the golden
    suite (tests/httpd by default; REF_HTTPD_EXTRAS_DIR replays the ACL
    suite against a server started in data-driven ACL mode)."""
    sc = parse_script(os.path.join(suite_dir, "scripts", name))
    if sc.unsupported:
        return ("skipped", sc.unsupported)
    # cors scripts: attach the uriescape'd query from the script text
    if any(st.kind == "curl" and "$escaped" in st.path for st in sc.steps):
        with open(os.path.join(suite_dir, "scripts", name)) as fh:
            m = re.search(r'uriescape\s+"([^"]+)"', fh.read())
        if m:
            for st in sc.steps:
                if st.kind == "curl":
                    st.text = m.group(1)
    exemplar = os.path.join(suite_dir, "exemplar", name)
    if not os.path.exists(exemplar):
        return ("skipped", "no exemplar")
    with open(exemplar, encoding="utf-8") as fh:
        want = fh.read()
    try:
        got = run_script(base, sc)
    except Exception as exc:  # noqa: BLE001
        return ("fail", f"{type(exc).__name__}: {exc}")
    ok, detail = compare_output(got, want)
    return ("pass", detail) if ok else ("fail", detail)
