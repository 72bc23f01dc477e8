#!/usr/bin/env python3
"""Adversarial BINARY-ASSET-STORE corpus for ENGINE<->ORACLE fuzzing.

advcorpus/advvectors/adv-dims/advevents cover the text, vector,
dimension and events read paths; this one covers the ASSET family —
the staged binary stores (os2 binaryFile export, mm10 manifest
reconcile, mm11 WebDataset sample dir, os3 gzip JSONL) and the native
header parsers (mm5 image / mm6 wav / mm7 mp4 / mm8 npy / mm9 tar),
whose payloads all derive from documents.text.

The staging writers re-derive each store from this corpus (the
sfDir-name-keyed marker-and-stamp scheme isolates it from the benign
scale dirs), so hostile TEXT here becomes hostile STAGED BYTES there.

Planted classes (each row targets one contract):
  - empty/NULL text in the staged prefixes: Spark's binaryFile listing
    DROPS zero-byte files — the pinned listing-drop contract (os2 row
    absent, mm10 `missing_from_scan`, mm11 skip-write => missing part).
  - NULL/empty lang, hostile source (quotes, backslash, control chars,
    NULL, unicode) in the mm11 prefix: the .cls skip rule and the
    .json staging writer's escaping.
  - embedded LF / CRLF / NUL / tab in text within the os3 prefix: the
    gzip JSONL staging writer's line discipline.
  - multi-byte payloads (CJK / emoji / RTL / NBSP / zalgo) in every
    staged prefix: byte-vs-char length, md5-over-UTF-8-bytes, and the
    ASCII-prefix guards of every header oracle.
  - header-magic payloads, all craftable in valid UTF-8:
      * GIF87a/GIF89a with in-range and truncated logical-screen bytes
        (mm5 width/height little-endian reads; mm2 decode flag),
      * RIFF....WAVE with ASCII-encodable size words, truncated RIFF,
        and a declared size far past EOF (mm6 overrun),
      * ftyp boxes with low-byte sizes — valid, truncated, and a
        0x20202020 (~539 MB) declared size (mm7 box-walk bounds),
      * `ustar` magic at byte 257 inside and NOT inside a 512-byte
        header, non-ASCII bytes before the magic (mm9 is_tar guard),
      * NPY: 0x93 is a UTF-8 continuation byte, so the magic is
        UNREACHABLE from VARCHAR — planted near-misses only (mm8).
  - oversized text (64 KiB) in no staged prefix: header parsers must
    stay bounded-read.

File-NAME hostility (underscore-prefixed names Spark's listing hides,
orphan parts, conflicting duplicate stems, size drift) cannot be
expressed through the corpus — the staging writers own the names —
and is exercised on planted fixture dirs in MultimodalSpec instead.
Non-UTF8 file NAMES are platform-locale-dependent (java.io.File maps
them through sun.jnu.encoding) and are documented as out of scope.

Round-14 catch record (each fixed + pinned the same day; closing
replay 13/13 hash-exact, benign sf0.01 replay unchanged):
  - mm2 DIED (NPE in MessageDigest): a NULL text payload reached the
    typed mapPartitions decode. Contract: the decode stage SKIPS NULL
    payloads (nothing to decode; V4 owns null routing), oracle carries
    the same IS NOT NULL predicate.
  - NULL-payload format class (mm5/mm6/mm7/mm8/mm9): the engine's
    null-propagating header expressions emit format=NULL, the oracles'
    CASE guards rendered 'unknown' (NULL LIKE -> NULL -> ELSE branch).
    Every header oracle now pins "NULL payload => NULL format".
  - mm9 on REAL tars: planted all-ASCII archives (valid single-member,
    bad-octal header, payload-overrun member) forced the documented
    extend-the-oracle move — the member walk is now mirrored as a
    recursive CTE (same stop rules as TarMembers.compute), proven
    field-exact on every planted archive.
  - mm6 on a REAL PCM header: same move — the fmt/data chunk walk is
    now a recursive CTE (little-endian fields via ascii(), alignment
    pad, overrun stop), field-exact incl. duration arithmetic.
  - mm2 `decoded` contract sharpened: the oracle's GIF-magic LIKE said
    true where ImageIO (the engine truth) fails every prose-derived
    GIF — pinned to constant false with the loud-mismatch posture for
    any payload that ever truly decodes.
  - listing-drop class CLOSED end-to-end (with the r14 os2/mm10/mm11
    oracle contracts): empty and NULL text assets verify hash-exact as
    absent scan rows / missing_from_scan / incomplete samples instead
    of reading as count-gap noise.
Second wave (the FULL-registry replay over this corpus — the first
corpus ever to plant NULL text — closing 190/190 hash-exact):
  - sa9 DIED (NOT_NULL_ASSERT_VIOLATION): tokens(NULL) was NULL and a
    NULL token count reached a typed Tuple3 long. Root fix: the ONE
    shared tokenizer (functions.tokens / tokensSql) now pins "NULL
    document => zero tokens" in both twins — which also fixed dd5
    (a NULL simhash grouped a doc with ITSELF through NULL band keys
    while its signature read back as garbage 0 from a non-nullable
    struct slot) and td26 (NULL where the word-free contract says 0).
  - NULL ORDER BY placement, round 2 (dd1 text_hash, td7 lang, sa14
    source): Spark sorts group-key NULLs first, DuckDB last — every
    nullable ASC sort key in a documents oracle now pins NULLS FIRST
    (the advevents events-oracle rule, extended to this family).

Usage:
    python3 tools/advassets.py /tmp/advassets
    sbt -batch "runMain graft.Verify /tmp/advassets /tmp/v_advas \
        mm1_binary_meta,mm2_decode_assets,mm3_frame_sample,\
        mm4_resize_plan,mm5_image_headers,mm6_wav_headers,\
        mm7_mp4_headers,mm8_npy_headers,mm9_tar_members,\
        mm10_asset_reconcile,mm11_sample_assembly,os2_binary_assets,\
        os3_gzip_jsonl"
    python3 tools/diffcheck.py /tmp/advassets /tmp/v_advas <same list>
"""
import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/advassets"
os.makedirs(dst, exist_ok=True)

SRC = "/root/testdata/sf0.01"
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "embeddings"]:
    shutil.copyfile(f"{SRC}/{t}.parquet", f"{dst}/{t}.parquet")

rows = []  # (doc_id, text, lang, source)
did = 0


def add(text, lang="en", source="srcA"):
    global did
    rows.append((did, text, lang, source))
    did += 1


# ---- benign anchors inside every staged prefix so each store has
# normal structure around the hostile rows (ids 0-9)
for i in range(10):
    add(("scan value table row filter join " * (i + 2)).strip(),
        lang=("en" if i % 2 == 0 else "de"),
        source=("srcA" if i % 3 else "srcB"))

# ---- the listing-drop class (ids 10-11): os2 scan row absent, mm10
# missing_from_scan, mm11 txt part skipped => complete=false
add("")                       # 10: zero-byte asset
add(None)                     # 11: NULL text stages as zero bytes

# ---- mm11 modality-skip and json-escaping classes (ids 12-16)
add("cls-less sample body", lang=None)        # 12: NULL lang => no .cls
add("empty-lang sample body", lang="")        # 13: empty lang => no .cls
add("quoted source", source='he said "hi" \\ C:\\path')   # 14
add("control source", source="a\x01b\nc")                 # 15
add("null source", source=None)                            # 16

# ---- os3 JSONL line discipline (ids 17-19; os3 prefix is doc_id<100)
add("line one\nline two\r\nline three\rend")   # 17: every newline kind
add("tab\tand nul \x00 inside")                # 18
add('json-ish text with "quotes" and \\ backslashes {\"k\": 1}')  # 19

# ---- multi-byte payloads (ids 20-24): byte-vs-char, md5, ASCII guards
add("日本語のテキストです。画像ではありません。")             # 20: CJK
add("emoji 🎛️🧪 payload with ZWJ 👩‍🔬 sequences")          # 21
add("عربي نص rtl mixed with latin")                        # 22: RTL
add("nbsp\u00a0separated\u00a0tokens")                      # 23
add("z\u0335\u0327a\u0334\u0310l\u0336\u0301g\u0337\u030fo\u0338\u031b text")  # 24

# ---- GIF headers (ids 25-29): the one image magic craftable in UTF-8.
# logical screen: width u16le at bytes 7-8, height at 9-10 — keep every
# header byte in 0x01-0x7f so char positions ARE byte positions
add("GIF89a" + "\x20\x01" + "\x2c\x01" + "\x70\x00" + "x" * 64)  # 25: 288x300
add("GIF87a" + "\x40\x00" + "\x40\x00" + "\x00\x00" + "y" * 32)  # 26: 64x64, NULs in header tail
add("GIF89a")                                                    # 27: magic only, truncated screen
add("GIF89a" + "\x7f")                                           # 28: one screen byte
add("gif89a" + "\x20\x01\x2c\x01\x70\x00" + "z" * 16)            # 29: lowercase magic (must NOT parse)

# ---- WAV / RIFF (ids 30-33)
add("RIFF" + "\x24\x08\x00\x00" + "WAVEfmt " + "\x10\x00\x00\x00"
    + "\x01\x00\x02\x00" + "\x44\x2c\x00\x00" + "\x10\x62\x05\x00"
    + "\x04\x00\x10\x00" + "data" + "\x00\x08\x00\x00" + "p" * 64)  # 30: plausible PCM header
add("RIFF" + "\x7f\x7f\x7f\x7f" + "WAVE")      # 31: declared size ~2 GB past EOF
add("RIFF" + "\x10\x00")                       # 32: truncated before WAVE
add("RIFX" + "\x24\x08\x00\x00" + "WAVE")      # 33: big-endian variant (must NOT parse as wav)

# ---- MP4 / ftyp (ids 34-37)
add("\x00\x00\x00\x14ftypisom\x00\x00\x02\x00isom" + "m" * 32)  # 34: valid 20-byte ftyp
add("    ftypisomisom")                                          # 35: size 0x20202020 (~539 MB) overrun
add("\x00\x00\x00\x08ftyp")                                      # 36: box smaller than its own header
add("\x00\x00\x00\x14fTypisom\x00\x00\x02\x00isom")              # 37: case-wrong fourcc (must NOT parse)

# ---- TAR / ustar (ids 38-40)
_tar_hdr = ("hello.txt" + "\x00" * (100 - 9)      # name
            + "0000644\x00" + "0000000\x00" + "0000000\x00"  # mode uid gid
            + "00000000017\x00"                    # size = 15 octal
            + "00000000000\x00"                    # mtime
            + "        "                           # chksum (spaces = unset)
            + "0"                                  # typeflag
            + "\x00" * 100                         # linkname
            + "ustar\x00" + "00")                  # magic+version at 257
add(_tar_hdr + "\x00" * (512 - len(_tar_hdr)) + "fifteen bytes!!" + "\x00" * 497)  # 38: one-member tar
add("x" * 257 + "ustar" + "y" * 100)               # 39: magic at 257 but < 512 total... padded below
add("字" * 90 + "ustar" + "z" * 300)               # 40: multibyte before the magic (byte offset != char offset)

# fix id 39 to be >= 512 bytes so ONLY the guard decides
rows[39] = (39, "x" * 257 + "ustar00" + "w" * 300, "en", "srcA")

# ---- NPY near-misses (ids 41-42): the true magic 0x93 cannot lead a
# UTF-8 string — these must all stay 'unknown'
add("\u0093NUMPY\x01\x00")      # 41: U+0093 encodes as C2 93, NOT a leading 93 byte
add("NUMPY\x01\x00v\x00{'descr': '<f8', 'fortran_order': False, 'shape': (3,)}")  # 42

# ---- bounded-read probe (id 43): 64 KiB body, outside staged prefixes
# only by size (id < 50 keeps it IN the os2/mm11 prefix on purpose:
# the store must stage and hash it byte-exactly too)
add("A" * 65536)

# ---- header-magic rows OUTSIDE every staged prefix (ids 100+): the
# mm5-mm9 parsers scan the whole corpus
filler = [(i, f"plain body {i} " * 8, "en", f"src{i % 5}") for i in range(44, 100)]
rows.extend(filler)
did = 100
add("GIF89a" + "\x01\x00" + "\x01\x00" + "\x00\x00")  # 100: 1x1 gif header
add("RIFF" + "\x00" * 4 + "WAVE" + "junk")            # 101: zero declared size
add(_tar_hdr + "\x00" * (512 - len(_tar_hdr)))        # 102: header-only tar, no payload
add("\x00\x00\x00\x10ftypM4A " + "tail")              # 103: brand with trailing space
add("GIF89a\x20\x01\x2c\x01\x70\x00" + "日本" * 10)    # 104: ascii header, multibyte tail

texts = [r[1] for r in rows]
tbl = pa.table({
    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
    "text": pa.array(texts, pa.string()),
    "lang": pa.array([r[2] for r in rows], pa.string()),
    "source": pa.array([r[3] for r in rows], pa.string()),
    "n_chars": pa.array([len(t) if t is not None else None for t in texts],
                        pa.int64()),
})
pq.write_table(tbl, f"{dst}/documents.parquet")
print(f"wrote {len(rows)} adversarial asset docs to {dst}/documents.parquet")
