#!/usr/bin/env python3
"""Golden-output generator: executes the reference ETL script unmodified
against /root/reference/diplom, with two tiny in-process stand-ins:

- a minimal BeautifulSoup-compatible DOM (stdlib html.parser) covering the
  API surface the script uses (find/find_all(recursive=False)/get/
  get_text(strip=True)/decode_contents),
- an in-memory fake psycopg2 that understands the script's eight fixed
  SQL statement shapes.

Output: tools/golden/{inspectors,locations,ranks,professions,educations,
assignments}.json — the exact rows the reference would have written to
PostgreSQL. These are the correctness anchor for the Scala ETL.

Dev-tool only (runs with the driver-side python); not part of the engine.
"""
import html
import io
import json
import os
import re
import sys
import types
from html.parser import HTMLParser

# ---------------------------------------------------------------- fake bs4
VOID = {"br", "img", "col", "hr", "meta", "link", "input"}


class Node:
    def __init__(self, name, attrs=None):
        self.name = name
        self.attrs = dict(attrs or {})
        self.children = []  # Node or str (text)

    def __getitem__(self, key):
        v = self.get(key)
        if v is None:
            raise KeyError(key)
        return v

    def get(self, key, default=None):
        if key == "class":
            v = self.attrs.get("class")
            return v.split() if v else (default if default is not None else None)
        return self.attrs.get(key, default)

    def _iter(self):
        for c in self.children:
            if isinstance(c, Node):
                yield c
                yield from c._iter()

    def find(self, name):
        for n in self._iter():
            if n.name == name:
                return n
        return None

    def find_all(self, name, recursive=True):
        if recursive:
            return [n for n in self._iter() if n.name == name]
        return [c for c in self.children if isinstance(c, Node) and c.name == name]

    def _strings(self):
        for c in self.children:
            if isinstance(c, str):
                yield c
            else:
                yield from c._strings()

    def get_text(self, strip=False):
        if strip:
            return "".join(s.strip() for s in self._strings() if s.strip())
        return "".join(self._strings())

    def decode_contents(self, formatter=None):
        out = []
        for c in self.children:
            if isinstance(c, str):
                out.append(html.escape(c, quote=False))
            else:
                out.append(c._serialize())
        return "".join(out)

    def _serialize(self):
        attrs = "".join(f' {k}="{html.escape(v)}"' for k, v in self.attrs.items())
        if self.name in VOID:
            return f"<{self.name}{attrs}/>"
        return f"<{self.name}{attrs}>{self.decode_contents()}</{self.name}>"


class TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("[document]")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = Node(tag, attrs)
        self.stack[-1].children.append(node)
        if tag not in VOID:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].children.append(Node(tag, attrs))

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].name == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


class NavigableString(str):
    pass


def _assert_balanced(text, name="<input>"):
    """Guard for the well-formedness assumption this DOM relies on.

    The reference parses with BeautifulSoup(..., 'lxml'); lxml's error
    recovery (implied end tags, table normalization) can produce a
    different DOM on MALFORMED markup than stdlib html.parser does. The
    golden outputs are only a faithful oracle while the corpus stays
    balanced, machine-regular HTML — so fail loudly if that ever changes.
    """
    for tag in ("table", "tbody", "thead", "tr", "td", "th", "span"):
        n_open = len(re.findall(rf"<{tag}[\s>]", text))
        n_close = text.count(f"</{tag}>")
        assert n_open == n_close, (
            f"{name}: unbalanced <{tag}>: {n_open} open vs {n_close} close — "
            "html.parser DOM may diverge from the reference's lxml DOM")


def BeautifulSoup(f, parser=None):
    text = f.read() if hasattr(f, "read") else f
    name = getattr(f, "name", "<input>")
    _assert_balanced(text, name)
    text = re.sub(r"<!--.*?-->", "", text, flags=re.DOTALL)
    tb = TreeBuilder()
    tb.feed(text)
    return tb.root


fake_bs4 = types.ModuleType("bs4")
fake_bs4.BeautifulSoup = BeautifulSoup
fake_bs4.NavigableString = NavigableString

# ------------------------------------------------------------ fake psycopg2
DDL_COLS = {
    "Inspectors": ["InspectorID", "FullName", "Notes"],
    "Locations": ["LocationID", "CityName", "GuberniaName", "OkrugName", "LocationType"],
    "Ranks": ["RankID", "Abbreviation", "FullName_RU", "RankType"],
    "Professions": ["ProfessionID", "Abbreviation", "FullName_RU"],
    "Educations": ["EducationID", "Abbreviation", "FullName_RU"],
    "Assignments": ["AssignmentID", "InspectorID", "Year", "SourceFile", "OkrugName",
                     "GuberniaName", "PositionRole", "UchastokIdentifier",
                     "UchastokDescription", "InspectorLocationID", "PersonnelRawString",
                     "RankID", "ProfessionID", "EducationID", "StartDateInYearRaw",
                     "EndDateInYearRaw", "IsActing", "IsVacancy", "AssignmentNotes",
                     "EstablishmentsCount", "WorkerCount", "BoilerCount"],
}

DB = {}
SEQ = {}


def reset_db():
    for t in DDL_COLS:
        DB[t] = []
        SEQ[t] = 0


class FakeError(Exception):
    pass


class FakeCursor:
    def __init__(self):
        self._result = []

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False

    def execute(self, sql, params=None):
        params = list(params) if params else []
        s = " ".join(sql.split())
        if s.startswith("DROP TABLE"):
            reset_db()
            return
        if "information_schema" in s:
            m = re.search(r"table_name='(\w+)'", s)
            t = m.group(1)
            has = any(c.lower() == "fullname_ru" for c in
                      next((cols for name, cols in DDL_COLS.items()
                            if name.lower() == t), []))
            self._result = [("fullname_ru",)] if has else []
            return
        m = re.match(r"SELECT (\w+) FROM (\w+) WHERE (\w+) = %s$", s)
        if m:
            pk, table, col = m.groups()
            self._result = [(r[pk],) for r in DB[table] if r[col] == params[0]]
            return
        if s.startswith("SELECT LocationID FROM Locations"):
            conds = s.split("WHERE ")[1].split(" AND ")
            pi = 0
            rows = DB["Locations"]
            for cond in conds:
                if cond.startswith("lower(CityName)"):
                    v = params[pi]; pi += 1
                    rows = [r for r in rows if (r["CityName"] or "").lower() == v.lower()]
                elif cond == "GuberniaName IS NULL":
                    rows = [r for r in rows if r["GuberniaName"] is None]
                elif cond.startswith("lower(GuberniaName)"):
                    v = params[pi]; pi += 1
                    rows = [r for r in rows if r["GuberniaName"] is not None
                            and r["GuberniaName"].lower() == v.lower()]
                elif cond == "OkrugName IS NULL":
                    rows = [r for r in rows if r["OkrugName"] is None]
                elif cond.startswith("lower(OkrugName)"):
                    v = params[pi]; pi += 1
                    rows = [r for r in rows if r["OkrugName"] is not None
                            and r["OkrugName"].lower() == v.lower()]
            self._result = [(r["LocationID"],) for r in rows]
            return
        if s.startswith("SELECT InspectorID, RankID, ProfessionID, EducationID FROM Assignments"):
            year, okrug, gub = params
            rows = [r for r in DB["Assignments"]
                    if r["Year"] == year and r["OkrugName"] == okrug
                    and r["GuberniaName"] == gub
                    and r["PositionRole"] == "Старший инспектор"
                    and r["InspectorID"] is not None]
            rows.sort(key=lambda r: r["AssignmentID"])
            self._result = ([(rows[-1]["InspectorID"], rows[-1]["RankID"],
                              rows[-1]["ProfessionID"], rows[-1]["EducationID"])]
                            if rows else [])
            return
        m = re.match(r"INSERT INTO (\w+) \(([^)]*)\) VALUES \([^)]*\)(?: RETURNING (\w+))?", s)
        if m:
            table, cols, pk = m.group(1), [c.strip() for c in m.group(2).split(",")], m.group(3)
            SEQ[table] += 1
            row = {c: None for c in DDL_COLS[table]}
            row[DDL_COLS[table][0]] = SEQ[table]
            for c, v in zip(cols, params):
                row[c] = v
            DB[table].append(row)
            self._result = [(SEQ[table],)] if pk else []
            return
        raise FakeError(f"unhandled SQL: {s[:120]}")

    def fetchone(self):
        return self._result[0] if self._result else None

    def close(self):
        pass


class FakeConn:
    def cursor(self):
        return FakeCursor()

    def commit(self):
        pass

    def rollback(self):
        pass

    def close(self):
        pass


fake_psycopg2 = types.ModuleType("psycopg2")
fake_psycopg2.connect = lambda **kw: FakeConn()
fake_psycopg2.Error = FakeError

# ------------------------------------------------------------------- run
def main():
    sys.modules["bs4"] = fake_bs4
    sys.modules["psycopg2"] = fake_psycopg2
    import logging
    logging.disable(logging.WARNING)  # keep warnings? silence below INFO

    src = open("/root/reference/populate_db_ru_v1.py", encoding="utf-8").read()
    src = src.replace('HTML_FOLDER = "/Users/macbook/diplom"',
                      'HTML_FOLDER = "/root/reference/diplom"')
    mod = types.ModuleType("refmod")
    mod.__dict__["__name__"] = "refmod"  # suppress __main__ block
    exec(compile(src, "populate_db_ru_v1.py", "exec"), mod.__dict__)

    conn = FakeConn()
    mod.setup_database(conn)
    mod.inspector_cache.clear(); mod.location_cache.clear()
    mod.rank_cache.clear(); mod.profession_cache.clear(); mod.education_cache.clear()
    for filename in mod.HTML_FILES:
        mod.process_html_file(conn, os.path.join(mod.HTML_FOLDER, filename))

    outdir = os.path.join(os.path.dirname(__file__), "golden")
    os.makedirs(outdir, exist_ok=True)
    for t, cols in DDL_COLS.items():
        with open(f"{outdir}/{t.lower()}.json", "w", encoding="utf-8") as f:
            json.dump(DB[t], f, ensure_ascii=False, indent=0, default=str)
        print(t, len(DB[t]))


if __name__ == "__main__":
    main()
