#!/usr/bin/env python3
"""Generate a .bam fixture from a .sam text fixture, byte-by-byte per the
SAM/BAM spec v1.6 (https://samtools.github.io/hts-specs/SAMv1.pdf):
BGZF blocks (gzip members with the BC extra subfield) wrapping the binary
BAM payload. Written from the spec, independently of the Scala reader it
validates."""
import struct, sys, zlib

SEQ_CODES = {c: i for i, c in enumerate("=ACMGRSVTWYHKDBN")}

def bgzf_block(payload: bytes) -> bytes:
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    cdata = co.compress(payload) + co.flush()
    bsize = len(cdata) + 25  # total block size (18+clen+8) minus 1, per spec
    header = struct.pack("<BBBBIBBH", 0x1f, 0x8b, 8, 4, 0, 0, 0xff, 6)
    extra = struct.pack("<ccHH", b"B", b"C", 2, bsize)
    trailer = struct.pack("<II", zlib.crc32(payload) & 0xffffffff, len(payload))
    return header + extra + cdata + trailer

BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000")

def encode_record(fields, refs):
    qname, flag, rname, pos, mapq, cigar, rnext, pnext, tlen, seq, qual = fields[:11]
    tags = fields[11:]
    ref_id = refs.index(rname) if rname in refs else -1
    if rnext == "*":
        next_ref_id = -1
    elif rnext == "=":
        next_ref_id = ref_id
    else:
        next_ref_id = refs.index(rnext) if rnext in refs else -1
    name = qname.encode() + b"\0"
    cigar_ops = b""
    n_cigar = 0
    if cigar != "*":
        import re
        for num, op in re.findall(r"(\d+)([MIDNSHP=X])", cigar):
            cigar_ops += struct.pack("<I", (int(num) << 4) | "MIDNSHP=X".index(op))
            n_cigar += 1
    packed = bytearray()
    for i in range(0, len(seq), 2):
        hi = SEQ_CODES[seq[i]]
        lo = SEQ_CODES[seq[i + 1]] if i + 1 < len(seq) else 0
        packed.append((hi << 4) | lo)
    if qual == "*" or len(qual) != len(seq):
        qual_b = b"\xff" * len(seq)
    else:
        qual_b = bytes(ord(c) - 33 for c in qual)
    tag_bytes = b""
    for t in tags:
        tag, typ, val = t.split(":", 2)
        if typ == "i":
            tag_bytes += tag.encode() + b"i" + struct.pack("<i", int(val))
        elif typ == "Z":
            tag_bytes += tag.encode() + b"Z" + val.encode() + b"\0"
        elif typ == "f":
            tag_bytes += tag.encode() + b"f" + struct.pack("<f", float(val))
        elif typ == "A":
            tag_bytes += tag.encode() + b"A" + val.encode()
        else:
            raise ValueError(f"unsupported tag type {typ}")
    body = struct.pack("<iiBBHHHiiii",
        ref_id, int(pos) - 1, len(name), int(mapq), 0, n_cigar, int(flag),
        len(seq), next_ref_id, int(pnext) - 1, int(tlen)) + name + cigar_ops + bytes(packed) + qual_b + tag_bytes
    return struct.pack("<i", len(body)) + body

def main(sam_path, bam_path):
    header_lines, records = [], []
    refs, ref_lens = [], []
    for line in open(sam_path):
        line = line.rstrip("\n")
        if not line:
            continue
        if line.startswith("@"):
            header_lines.append(line)
            if line.startswith("@SQ"):
                d = dict(f.split(":", 1) for f in line.split("\t")[1:])
                refs.append(d["SN"]); ref_lens.append(int(d["LN"]))
        else:
            records.append(line.split("\t"))
    text = ("\n".join(header_lines) + "\n").encode()
    payload = b"BAM\1" + struct.pack("<i", len(text)) + text
    payload += struct.pack("<i", len(refs))
    for name, ln in zip(refs, ref_lens):
        nb = name.encode() + b"\0"
        payload += struct.pack("<i", len(nb)) + nb + struct.pack("<i", ln)
    for rec in records:
        payload += encode_record(rec, refs)
    with open(bam_path, "wb") as f:
        # split payload across blocks to exercise multi-block reading
        step = 200
        for i in range(0, len(payload), step):
            f.write(bgzf_block(payload[i:i + step]))
        f.write(BGZF_EOF)
    print(f"wrote {bam_path}: {len(records)} records, {len(refs)} refs")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
