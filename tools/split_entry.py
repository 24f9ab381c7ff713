#!/usr/bin/env python3
"""One-shot mechanical splitter for SparkEntry.scala (round-13 judge ask:
no file > 2,500 lines). Moves the two driver-contract map literals into
per-family trait files (queries + oracles per family, entries verbatim);
SparkEntry keeps every helper and merges the family maps. Self-types pin
each trait to SparkEntry.type so unqualified helper references keep
resolving; helper visibility widens private -> private[graft] for that.

Run from the repo root:  python3 tools/split_entry.py
Idempotence: none — run once, review `git diff`, compile, test.
"""
import re, os

PATH = 'src/main/scala/graft/SparkEntry.scala'
src = open(PATH).read().split('\n')

def find_line(pred, start=0):
    for i in range(start, len(src)):
        if pred(src[i]):
            return i
    raise SystemExit(f'marker not found after {start}')

q_def = find_line(lambda l: l.startswith('  def queries: Map[String, (SparkSession, String) => DataFrame] = Map('))
q_end = find_line(lambda l: l == '  )', q_def)
o_def = find_line(lambda l: l.startswith('  def oracleSql: Map[String, String] = Map('), q_end)
o_end = find_line(lambda l: l == '  )', o_def)

ENTRY = re.compile(r'^    "([a-zA-Z0-9_]+)" ->')

def blocks(start, end):
    """[(name, block_start, entry_line)] with comment prefix attached."""
    idx = [(ENTRY.match(src[i]).group(1), i)
           for i in range(start + 1, end) if ENTRY.match(src[i])]
    out = []
    for name, i in idx:
        b = i
        while b - 1 > start and (src[b - 1].strip() == '' or
                                 src[b - 1].lstrip().startswith('//')):
            b -= 1
        out.append((name, b, i))
    return out

def fam(n):
    if n.startswith('m'): return 'Multimodal'
    if n.startswith('t'): return 'Text'
    if n.startswith('x'): return 'Dedup'
    if n.startswith('y'): return 'Knn'
    if n.startswith('s'): return 'Curation'
    num = int(re.match(r'q(\d+)', n).group(1))
    if num >= 95: return 'Curation'
    return 'RelA' if num <= 50 else 'RelB'

FAMS = ['RelA', 'RelB', 'Text', 'Dedup', 'Knn', 'Multimodal', 'Curation']

def split_map(start, end):
    bs = blocks(start, end)
    grouped = {f: [] for f in FAMS}
    for k, (name, b, _) in enumerate(bs):
        e = bs[k + 1][1] if k + 1 < len(bs) else end
        text = '\n'.join(src[b:e]).rstrip()
        if text.endswith(','):
            text = text[:-1]
        grouped[fam(name)].append(text)
    return grouped

qg = split_map(q_def, q_end)
og = split_map(o_def, o_end)

header_end = find_line(lambda l: l.startswith('import graft.ops.ValidateOps._'))
header = '\n'.join(src[:header_end + 1])

QSIG = 'Map[String, (SparkSession, String) => DataFrame]'
for f in FAMS:
    body_q = ',\n\n'.join(qg[f])
    body_o = ',\n\n'.join(og[f])
    content = f'''{header}

/** {f} family of the driver contract — query declarations and their
  * DuckDB oracle SQL, split verbatim out of SparkEntry.scala (round 13,
  * pure mechanical move; no behavior change). The self-type pins this
  * trait to the SparkEntry object so every helper reference (rd, model
  * memoizers, shared oracle CTEs) resolves exactly as before the split.
  */
private[graft] trait Entry{f} {{ this: SparkEntry.type =>

  private[graft] def queries{f}: {QSIG} = Map(
{body_q}
  )

  private[graft] def oracles{f}: Map[String, String] = Map(
{body_o}
  )
}}
'''
    open(f'src/main/scala/graft/Entry{f}.scala', 'w').write(content)
    print(f'Entry{f}.scala: {content.count(chr(10)) + 1} lines '
          f'({len(qg[f])} queries, {len(og[f])} oracles)')

merge_q = ' ++\n    '.join(f'queries{f}' for f in FAMS)
merge_o = ' ++\n    '.join(f'oracles{f}' for f in FAMS)
new_q = (f'  def queries: {QSIG} =\n    {merge_q}')
new_o = (f'  def oracleSql: Map[String, String] =\n    {merge_o}')

out = src[:q_def] + [new_q] + src[q_end + 1:o_def] + [new_o] + src[o_end + 1:]
text = '\n'.join(out)
text = text.replace('object SparkEntry {',
    'object SparkEntry extends ' + ' with '.join(f'Entry{f}' for f in FAMS) + ' {', 1)
text = re.sub(r'^  private (def|val|lazy val)', r'  private[graft] \1',
              text, flags=re.M)
open(PATH, 'w').write(text)
print(f'SparkEntry.scala: {text.count(chr(10)) + 1} lines')
