#!/usr/bin/env python3
"""Independent twin of the graft PTB-compat tokenizer spec.

Implements the documented rule chain — the classic Penn Treebank
tokenizer (PTB tokenizer.sed, as published in NLTK's
TreebankWordTokenizer) applied PER LINE, followed by the reference
pipeline's post-processing (strip ASCII punctuation from both ends,
drop empties, lowercase; reference: src/worker.py:37-53).  Used to
compute the golden fixtures in PtbTokenizerSpec — an implementation
independent from the Scala expression, so both are validated against
the same written spec.
"""
import re, sys, os, string, collections

STARTING = [
    (re.compile(r'^\"'), r'``'),
    (re.compile(r'(``)'), r' \1 '),
    (re.compile(r'([ \(\[{<])(\"|\'{2})'), r'\1 `` '),
]
PUNCT = [
    (re.compile(r'([:,])([^\d])'), r' \1 \2'),
    (re.compile(r'([:,])$'), r' \1 '),
    (re.compile(r'\.\.\.'), r' ... '),
    (re.compile(r'[;@#$%&]'), r' \g<0> '),
    (re.compile(r'([^\.])(\.)([\]\)}>"\']*)\s*$'), r'\1 \2\3 '),
    (re.compile(r'[?!]'), r' \g<0> '),
    (re.compile(r"([^'])' "), r"\1 ' "),
]
PARENS = [(re.compile(r'[\]\[\(\)\{\}\<\>]'), r' \g<0> ')]
DASHES = [(re.compile(r'--'), r' -- ')]
ENDING = [
    (re.compile(r'"'), " '' "),
    (re.compile(r"(\S)(\'\')"), r'\1 \2 '),
    (re.compile(r"([^' ])('[sS]|'[mM]|'[dD]|') "), r'\1 \2 '),
    (re.compile(r"([^' ])('ll|'LL|'re|'RE|'ve|'VE|n't|N'T) "), r'\1 \2 '),
]
CONTR2 = [re.compile(p, re.IGNORECASE) for p in (
    r'\b(can)(not)\b', r"\b(d)('ye)\b", r'\b(gim)(me)\b',
    r'\b(gon)(na)\b', r'\b(got)(ta)\b', r'\b(lem)(me)\b',
    r"\b(more)('n)\b", r'\b(wan)(na)(?=\s)')]
CONTR3 = [re.compile(p, re.IGNORECASE) for p in (
    r" ('t)(is)\b", r" ('t)(was)\b")]

def ptb_line(line):
    t = line
    for p, r in STARTING: t = p.sub(r, t)
    for p, r in PUNCT: t = p.sub(r, t)
    for p, r in PARENS: t = p.sub(r, t)
    for p, r in DASHES: t = p.sub(r, t)
    t = ' ' + t + ' '
    for p, r in ENDING: t = p.sub(r, t)
    for p in CONTR2: t = p.sub(r' \1 \2 ', t)
    for p in CONTR3: t = p.sub(r' \1 \2 ', t)
    return t.split()

def separate_words(line):
    out = []
    for w in ptb_line(line):
        w = w.strip(string.punctuation)
        if w: out.append(w.lower())
    return out

if __name__ == '__main__':
    d = sys.argv[1] if len(sys.argv) > 1 else '/root/reference/files/inputs'
    cnt = collections.Counter(); total = 0
    for fn in sorted(os.listdir(d)):
        if not fn.endswith('.txt'): continue
        with open(os.path.join(d, fn)) as f:
            for line in f:
                for w in separate_words(line.rstrip('\n').rstrip('\r')):
                    cnt[w] += 1; total += 1
    print('total', total, 'distinct', len(cnt))
    print('top10', sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:10])
    # canonical examples for the unit spec
    for s in ["Don't say \"cannot\" -- he'll regret it.",
              "She's gonna win, isn't she?",
              "The U.S.A.'s top-rated (really!) engine... runs fast.",
              "'Tis more'n I'd hoped; you're right.",
              # Abbreviation corners: where NLTK's Punkt sentence model
              # would place (or suppress) a boundary mid-line.  The
              # strip/lower/filter post-pass makes the outputs identical
              # either way -- "U.S.A." yields u.s.a whether or not the
              # $-anchored final-period rule fires (strip removes a
              # trailing period just as the rule would split it off).
              "Mr. Holmes said the U.S.A. Then he left.",
              "He arrived at 3 p.m. Then we ate.",
              "See fig. 4 for details, etc. is an abbreviation."]:
        print(repr(s), '->', separate_words(s))
