// Native IO runtime for seeksv_tpu.
//
// Replaces the role of the reference's bundled libbam.a (samtools-0.1.x,
// ref: sam/) with a from-scratch, multithreaded BGZF+BAM decoder that
// fills structure-of-arrays buffers directly consumable as numpy arrays
// through ctypes (seeksv_tpu/io/native.py).
//
// Layout contract (must match io/bam.py BamRecords):
//   per record: flag, tid, pos, mapq, mtid, mpos, isize, l_qseq, xc  (i32)
//   ragged:     cig (u32, bam encoding) + cig_off (i64, n+1)
//               seq (u8 ASCII) / qual (u8 raw phred) + seq_off (i64, n+1)
//               qnames (u8 concat) + qname_off (i64, n+1)
//
// Build: make -C csrc   (g++ -O3 -shared -fPIC -lz -lpthread)

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <utility>
#include <vector>

#include <zlib.h>

#if defined(__GLIBC__)
#include <malloc.h>
// Slab buffers (hundreds of MB per chunk) churn every chunk; with the
// default M_MMAP_THRESHOLD each cycle is mmap+fault-in+munmap.  Keeping
// them on the main heap lets glibc reuse the pages across slabs (heap
// high-water stays ~2 slabs, the prefetch depth).
__attribute__((constructor)) static void seeksv_tune_malloc() {
  mallopt(M_MMAP_THRESHOLD, 1 << 30);
  // keep multi-GB frees on the heap: this host faults fresh anonymous
  // pages at ~150 MB/s, so handing a 2 GB buffer back to the OS costs
  // ~13 s to refault on the next allocation of the same size
  mallopt(M_TRIM_THRESHOLD, 1 << 30);
}
#endif

namespace {

struct Block {
  size_t comp_off;   // offset of deflate payload within file buffer
  size_t comp_len;   // payload length (without header/footer)
  size_t out_off;    // offset in the decompressed stream
  size_t out_len;    // ISIZE
};

// Scans complete BGZF blocks in [buf, buf+n); stops at a trailing partial
// block.  *consumed = bytes of complete blocks.  Returns false on a
// malformed (non-BGZF) header at a block boundary.
bool scan_bgzf_prefix(const uint8_t* buf, size_t n, std::vector<Block>* out,
                      size_t* total_out, size_t* consumed) {
  size_t off = 0;
  size_t out_off = 0;
  while (off + 18 <= n) {
    if (buf[off] != 0x1f || buf[off + 1] != 0x8b) return false;
    uint8_t flg = buf[off + 3];
    size_t p = off + 10;
    size_t bsize = 0;
    if (flg & 4) {  // FEXTRA
      uint16_t xlen;
      memcpy(&xlen, buf + p, 2);
      size_t xend = p + 2 + xlen;
      if (xend > n) break;  // header incomplete: wait for more bytes
      p += 2;
      while (p + 4 <= xend) {
        uint8_t si1 = buf[p], si2 = buf[p + 1];
        uint16_t slen;
        memcpy(&slen, buf + p + 2, 2);
        if (si1 == 'B' && si2 == 'C' && slen == 2) {
          uint16_t bs;
          memcpy(&bs, buf + p + 4, 2);
          bsize = (size_t)bs + 1;
        }
        p += 4 + slen;
      }
      p = xend;
    }
    if (bsize == 0) return false;  // not BGZF
    size_t data_off = p;
    size_t block_end = off + bsize;
    if (block_end > n) break;  // partial block at tail
    if (block_end < data_off + 8) return false;
    uint32_t isize;
    memcpy(&isize, buf + block_end - 4, 4);
    out->push_back({data_off, block_end - data_off - 8, out_off, isize});
    out_off += isize;
    off = block_end;
  }
  *total_out = out_off;
  *consumed = off;
  return true;
}

bool scan_bgzf_blocks(const uint8_t* buf, size_t n, std::vector<Block>* out,
                      size_t* total_out) {
  size_t off = 0;
  size_t out_off = 0;
  while (off + 18 <= n) {
    if (buf[off] != 0x1f || buf[off + 1] != 0x8b) return false;
    uint8_t flg = buf[off + 3];
    size_t p = off + 10;
    size_t bsize = 0;
    if (flg & 4) {  // FEXTRA
      uint16_t xlen;
      memcpy(&xlen, buf + p, 2);
      size_t xend = p + 2 + xlen;
      p += 2;
      while (p + 4 <= xend) {
        uint8_t si1 = buf[p], si2 = buf[p + 1];
        uint16_t slen;
        memcpy(&slen, buf + p + 2, 2);
        if (si1 == 'B' && si2 == 'C' && slen == 2) {
          uint16_t bs;
          memcpy(&bs, buf + p + 4, 2);
          bsize = (size_t)bs + 1;
        }
        p += 4 + slen;
      }
      p = xend;
    }
    if (bsize == 0) return false;  // not BGZF (plain gzip member)
    size_t data_off = p;
    size_t block_end = off + bsize;
    if (block_end > n || block_end < data_off + 8) return false;
    uint32_t isize;
    memcpy(&isize, buf + block_end - 4, 4);
    out->push_back({data_off, block_end - data_off - 8, out_off, isize});
    out_off += isize;
    off = block_end;
  }
  *total_out = out_off;
  return off == n;
}

#ifdef USE_LIBDEFLATE
#include <libdeflate.h>

bool inflate_block(const uint8_t* src, size_t src_len, uint8_t* dst,
                   size_t dst_len, libdeflate_decompressor* d) {
  if (dst_len == 0) return true;
  size_t actual = 0;
  return libdeflate_deflate_decompress(d, src, src_len, dst, dst_len,
                                       &actual) == LIBDEFLATE_SUCCESS &&
         actual == dst_len;
}

struct InflateCtx {
  libdeflate_decompressor* d;
  InflateCtx() : d(libdeflate_alloc_decompressor()) {}
  ~InflateCtx() { libdeflate_free_decompressor(d); }
};
#else
bool inflate_block(const uint8_t* src, size_t src_len, uint8_t* dst,
                   size_t dst_len, void* /*ctx*/ = nullptr) {
  z_stream zs;
  memset(&zs, 0, sizeof(zs));
  if (inflateInit2(&zs, -15) != Z_OK) return false;
  zs.next_in = const_cast<uint8_t*>(src);
  zs.avail_in = (uInt)src_len;
  zs.next_out = dst;
  zs.avail_out = (uInt)dst_len;
  int ret = inflate(&zs, Z_FINISH);
  inflateEnd(&zs);
  return ret == Z_STREAM_END || (ret == Z_OK && zs.avail_out == 0) ||
         (dst_len == 0 && ret == Z_BUF_ERROR);
}

struct InflateCtx {
  void* d = nullptr;
};
#endif

const char kNt16[17] = "=ACMGRSVTWYHKDBN";

// byte -> two unpacked ASCII bases (little-endian: low byte = high nibble,
// i.e. the first base in BAM 4-bit packing)
struct PairLut {
  uint16_t v[256];
  PairLut() {
    for (int b = 0; b < 256; b++)
      v[b] = (uint16_t)((uint8_t)kNt16[b >> 4] |
                        ((uint16_t)(uint8_t)kNt16[b & 0xF] << 8));
  }
};
const PairLut kPairLut;

int32_t aux_xc(const uint8_t* a, const uint8_t* end) {
  int32_t xc = 0;
  const uint8_t* p = a;
  while (p + 3 <= end) {
    uint8_t t0 = p[0], t1 = p[1], typ = p[2];
    p += 3;
    int64_t val = 0;
    size_t sz = 0;
    bool is_int = false;
    switch (typ) {
      case 'A': sz = 1; break;
      case 'c': val = *(const int8_t*)p; sz = 1; is_int = true; break;
      case 'C': val = *p; sz = 1; is_int = true; break;
      case 's': { int16_t v; memcpy(&v, p, 2); val = v; sz = 2; is_int = true; } break;
      case 'S': { uint16_t v; memcpy(&v, p, 2); val = v; sz = 2; is_int = true; } break;
      case 'i': { int32_t v; memcpy(&v, p, 4); val = v; sz = 4; is_int = true; } break;
      case 'I': { uint32_t v; memcpy(&v, p, 4); val = (int64_t)v; sz = 4; is_int = true; } break;
      case 'f': sz = 4; break;
      case 'Z':
      case 'H': {
        const uint8_t* q = p;
        while (q < end && *q) q++;
        sz = (size_t)(q - p) + 1;
      } break;
      case 'B': {
        if (p + 5 > end) return xc;
        uint8_t sub = p[0];
        int32_t cnt;
        memcpy(&cnt, p + 1, 4);
        size_t esz = (sub == 'c' || sub == 'C') ? 1
                     : (sub == 's' || sub == 'S') ? 2 : 4;
        sz = 5 + (size_t)cnt * esz;
      } break;
      default:
        return xc;
    }
    if (is_int && t0 == 'X' && t1 == 'C') xc = (int32_t)val;
    p += sz;
  }
  return xc;
}

}  // namespace

extern "C" {

struct BamSoA {
  int64_t n;
  int32_t* flag;
  int32_t* tid;
  int32_t* pos;
  int32_t* mapq;
  int32_t* mtid;
  int32_t* mpos;
  int32_t* isize;
  int32_t* l_qseq;
  int32_t* xc;
  int64_t* cig_off;
  uint32_t* cig;
  int64_t n_cig_total;
  int64_t* seq_off;
  uint8_t* seq;
  uint8_t* qual;
  int64_t n_seq_total;
  int64_t* qname_off;
  uint8_t* qnames;
  int64_t n_qname_total;
  int32_t n_refs;
  int32_t* ref_lens;
  uint8_t* ref_names;     // '\0'-joined
  int64_t ref_names_len;
  // byte offset of each record within the DECOMPRESSED stream ([n+1];
  // rec_off[n] = end of last record), plus the stream offset of the
  // first record (header size).  Consumed by the vectorized BAI builder
  // (io/bai.py) to map records to BGZF virtual offsets.
  int64_t* rec_off;
  int64_t body_off;
  char error[256];
};

void seeksv_bam_free(BamSoA* b) {
  if (!b) return;
  free(b->flag); free(b->tid); free(b->pos); free(b->mapq); free(b->mtid);
  free(b->mpos); free(b->isize); free(b->l_qseq); free(b->xc);
  free(b->cig_off); free(b->cig); free(b->seq_off); free(b->seq);
  free(b->qual); free(b->qname_off); free(b->qnames); free(b->ref_lens);
  free(b->ref_names); free(b->rec_off);
  free(b);
}

static BamSoA* fail(BamSoA* b, const char* msg) {
  snprintf(b->error, sizeof(b->error), "%s", msg);
  return b;
}

// Allocates + fills every per-record SoA buffer of `out` from the record
// pointers (each -> the 4-byte block_size prefix of one complete BAM
// record).  Shared by the whole-file decoder and the chunked stream.
// lazy_seq: skip the seq unpack + qual copy for records that are mapped
// with a mapped mate and have no soft-clipped end — the ~98% of records
// whose bases no consumer of the streaming path ever reads (the
// reference gets the same effect by keeping seq 4-bit packed in bam1_t
// and only touching clipped reads, clip_reads.cpp:112).  seq_off stays
// exact for every record; the skipped rows are simply uninitialised.
static void fill_records(const std::vector<const uint8_t*>& rec_ptrs,
                         BamSoA* out, int n_threads,
                         const uint8_t* base = nullptr,
                         int lazy_seq = 0) {
  const int64_t n = (int64_t)rec_ptrs.size();
  out->rec_off = (int64_t*)malloc(8 * (n + 1));
  if (base != nullptr) {
    for (int64_t i = 0; i < n; i++)
      out->rec_off[i] = (int64_t)(rec_ptrs[(size_t)i] - base);
    if (n > 0) {
      int32_t bs_last;
      memcpy(&bs_last, rec_ptrs[(size_t)(n - 1)], 4);
      out->rec_off[n] = out->rec_off[n - 1] + 4 + bs_last;
    } else {
      out->rec_off[0] = 0;
    }
  } else {
    memset(out->rec_off, 0, 8 * (n + 1));
  }
  int64_t cig_total = 0, seq_total = 0, qname_total = 0;
  for (int64_t i = 0; i < n; i++) {
    const uint8_t* r = rec_ptrs[(size_t)i];
    uint8_t l_read_name = r[4 + 8];
    uint16_t n_cigar;
    memcpy(&n_cigar, r + 4 + 12, 2);
    int32_t l_seq;
    memcpy(&l_seq, r + 4 + 16, 4);
    cig_total += n_cigar;
    seq_total += l_seq;
    qname_total += l_read_name - 1;
  }
  out->n = n;
  out->flag = (int32_t*)malloc(4 * (n ? n : 1));
  out->tid = (int32_t*)malloc(4 * (n ? n : 1));
  out->pos = (int32_t*)malloc(4 * (n ? n : 1));
  out->mapq = (int32_t*)malloc(4 * (n ? n : 1));
  out->mtid = (int32_t*)malloc(4 * (n ? n : 1));
  out->mpos = (int32_t*)malloc(4 * (n ? n : 1));
  out->isize = (int32_t*)malloc(4 * (n ? n : 1));
  out->l_qseq = (int32_t*)malloc(4 * (n ? n : 1));
  out->xc = (int32_t*)malloc(4 * (n ? n : 1));
  out->cig_off = (int64_t*)malloc(8 * (n + 1));
  out->seq_off = (int64_t*)malloc(8 * (n + 1));
  out->qname_off = (int64_t*)malloc(8 * (n + 1));
  out->cig = (uint32_t*)malloc(4 * (cig_total ? cig_total : 1));
  out->seq = (uint8_t*)malloc(seq_total ? seq_total : 1);
  out->qual = (uint8_t*)malloc(seq_total ? seq_total : 1);
  out->qnames = (uint8_t*)malloc(qname_total ? qname_total : 1);
  out->n_cig_total = cig_total;
  out->n_seq_total = seq_total;
  out->n_qname_total = qname_total;

  {  // offsets (sequential prefix pass)
    int64_t co = 0, so = 0, qo = 0;
    for (int64_t i = 0; i < n; i++) {
      const uint8_t* r = rec_ptrs[(size_t)i];
      uint8_t l_read_name = r[4 + 8];
      uint16_t n_cigar;
      memcpy(&n_cigar, r + 4 + 12, 2);
      int32_t l_seq;
      memcpy(&l_seq, r + 4 + 16, 4);
      out->cig_off[i] = co;
      out->seq_off[i] = so;
      out->qname_off[i] = qo;
      co += n_cigar;
      so += l_seq;
      qo += l_read_name - 1;
    }
    out->cig_off[n] = co;
    out->seq_off[n] = so;
    out->qname_off[n] = qo;
  }

  std::vector<std::thread> ths;
  int nt = n_threads < 1 ? 1 : n_threads;
  if ((int64_t)nt > n) nt = (int)(n > 0 ? n : 1);
  int64_t per = (n + nt - 1) / nt;
  auto work = [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; i++) {
      const uint8_t* r = rec_ptrs[(size_t)i];
      int32_t bs;
      memcpy(&bs, r, 4);
      const uint8_t* rend = r + 4 + bs;
      const uint8_t* q = r + 4;
      int32_t tid, pos2, l_seq, mtid, mpos, tlen;
      memcpy(&tid, q, 4);
      memcpy(&pos2, q + 4, 4);
      uint8_t l_read_name = q[8];
      uint8_t mapq = q[9];
      uint16_t n_cigar, flag;
      memcpy(&n_cigar, q + 12, 2);
      memcpy(&flag, q + 14, 2);
      memcpy(&l_seq, q + 16, 4);
      memcpy(&mtid, q + 20, 4);
      memcpy(&mpos, q + 24, 4);
      memcpy(&tlen, q + 28, 4);
      out->flag[i] = flag;
      out->tid[i] = tid;
      out->pos[i] = pos2;
      out->mapq[i] = mapq;
      out->mtid[i] = mtid;
      out->mpos[i] = mpos;
      out->isize[i] = tlen;
      out->l_qseq[i] = l_seq;
      const uint8_t* body = q + 32;
      // lazy mode also skips qname copies for fully-mapped-pair records:
      // the streaming consumers read qnames only to pair unmapped mates
      if (!lazy_seq || (flag & 0xC) != 0)
        memcpy(out->qnames + out->qname_off[i], body, l_read_name - 1);
      body += l_read_name;
      memcpy(out->cig + out->cig_off[i], body, 4 * (size_t)n_cigar);
      bool need_seq = true;
      if (lazy_seq) {
        need_seq = (flag & 0xC) != 0;  // unmapped or mate-unmapped
        if (!need_seq && n_cigar) {
          uint32_t c0, cl;
          memcpy(&c0, body, 4);
          memcpy(&cl, body + 4 * ((size_t)n_cigar - 1), 4);
          need_seq = (c0 & 0xF) == 4 || (cl & 0xF) == 4;  // soft clip
        }
      }
      body += 4 * (size_t)n_cigar;
      if (need_seq) {
        uint8_t* sdst = out->seq + out->seq_off[i];
        const int32_t half = l_seq >> 1;
        for (int32_t k = 0; k < half; k++)
          memcpy(sdst + 2 * k, &kPairLut.v[body[k]], 2);
        if (l_seq & 1) sdst[l_seq - 1] = (uint8_t)kNt16[body[half] >> 4];
        memcpy(out->qual + out->seq_off[i], body + (l_seq + 1) / 2,
               (size_t)l_seq);
      }
      body += (l_seq + 1) / 2 + l_seq;
      out->xc[i] = (body < rend) ? aux_xc(body, rend) : 0;
    }
  };
  if (nt == 1) {
    work(0, n);
  } else {
    for (int t = 0; t < nt; t++) {
      int64_t lo = t * per, hi = lo + per < n ? lo + per : n;
      if (lo >= hi) break;
      ths.emplace_back(work, lo, hi);
    }
    for (auto& th : ths) th.join();
  }
}

static BamSoA* bam_decode_impl(const char* path, int n_threads,
                               int32_t decode_flags) {
  BamSoA* out = (BamSoA*)calloc(1, sizeof(BamSoA));
  FILE* f = fopen(path, "rb");
  if (!f) return fail(out, "cannot open file");
  fseek(f, 0, SEEK_END);
  long fsize = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> comp((size_t)fsize);
  if (fread(comp.data(), 1, (size_t)fsize, f) != (size_t)fsize) {
    fclose(f);
    return fail(out, "short read");
  }
  fclose(f);

  std::vector<Block> blocks;
  size_t total = 0;
  if (!scan_bgzf_blocks(comp.data(), comp.size(), &blocks, &total))
    return fail(out, "not a BGZF file");
  std::vector<uint8_t> data(total);
  if (n_threads < 1) n_threads = (int)std::thread::hardware_concurrency();
  if (n_threads < 1) n_threads = 1;
  {
    std::vector<std::thread> ths;
    size_t nb = blocks.size();
    size_t per = (nb + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; t++) {
      size_t lo = t * per, hi = lo + per < nb ? lo + per : nb;
      if (lo >= hi) break;
      ths.emplace_back([&, lo, hi]() {
        InflateCtx ctx;
        for (size_t i = lo; i < hi; i++) {
          const Block& blk = blocks[i];
          inflate_block(comp.data() + blk.comp_off, blk.comp_len,
                        data.data() + blk.out_off, blk.out_len, ctx.d);
        }
      });
    }
    for (auto& th : ths) th.join();
  }

  const uint8_t* p = data.data();
  const uint8_t* end = p + data.size();
  if (data.size() < 12 || memcmp(p, "BAM\1", 4) != 0)
    return fail(out, "bad BAM magic");
  int32_t l_text;
  memcpy(&l_text, p + 4, 4);
  p += 8 + l_text;
  int32_t n_ref;
  memcpy(&n_ref, p, 4);
  p += 4;
  out->n_refs = n_ref;
  out->ref_lens = (int32_t*)malloc(sizeof(int32_t) * n_ref);
  std::string names;
  for (int i = 0; i < n_ref; i++) {
    int32_t l_name;
    memcpy(&l_name, p, 4);
    p += 4;
    names.append((const char*)p, (size_t)l_name);  // includes '\0'
    p += l_name;
    memcpy(&out->ref_lens[i], p, 4);
    p += 4;
  }
  out->ref_names_len = (int64_t)names.size();
  out->ref_names = (uint8_t*)malloc(names.size());
  memcpy(out->ref_names, names.data(), names.size());

  // collect record pointers, then shared SoA fill
  const uint8_t* rec = p;
  std::vector<const uint8_t*> rec_ptrs;
  while (rec + 4 <= end) {
    int32_t bs;
    memcpy(&bs, rec, 4);
    if (rec + 4 + bs > end) break;
    rec_ptrs.push_back(rec);
    rec = rec + 4 + bs;
  }
  out->body_off = (int64_t)(p - data.data());
  // the compressed copy is dead after inflate: drop its pages before
  // the SoA allocation (9.5 GB at 1 Gbp x 30x)
  comp.clear();
  comp.shrink_to_fit();
  fill_records(rec_ptrs, out, n_threads, data.data(),
               decode_flags & 1);
  return out;
}

BamSoA* seeksv_bam_decode(const char* path, int n_threads) {
  return bam_decode_impl(path, n_threads, 0);
}

// decode_flags bit0: lazy seq/qual/qname (fill_records lazy_seq) — the
// whole-file form of the streaming reader's lazy mode, for consumers
// that only need the numeric columns + cigars (e.g. the BAI builder:
// full decode of a 300M-record BAM is ~70 GB of seq/qual it never
// reads).
BamSoA* seeksv_bam_decode_flags(const char* path, int n_threads,
                                int32_t decode_flags) {
  return bam_decode_impl(path, n_threads, decode_flags);
}

// ---------------------------------------------------------------------------
// Chunked streaming reader: bounded-memory decode (the memory contract of
// the reference's per-chromosome flushes, ref: clip_reads.h:423-446, made
// explicit: compressed-read window + decompressed carry + one chunk of SoA).

struct BamStream {
  FILE* f = nullptr;
  int n_threads = 1;
  std::vector<uint8_t> comp;    // unconsumed compressed bytes (partial block)
  std::vector<uint8_t> dbuf;    // decompressed, unparsed bytes
  bool file_eof = false;
  bool failed = false;
  char error[256] = {0};
  // header (copied into every chunk's BamSoA)
  int32_t n_refs = 0;
  std::vector<int32_t> ref_lens;
  std::string ref_names;  // '\0'-joined

  static constexpr size_t kReadWindow = 16u << 20;  // compressed bytes/round

  // Reads one compressed window, inflates complete BGZF blocks into dbuf.
  // Returns false on error (error[] set) — no-op at file EOF.
  bool pump() {
    if (file_eof) return true;
    size_t old = comp.size();
    comp.resize(old + kReadWindow);
    size_t got = fread(comp.data() + old, 1, kReadWindow, f);
    comp.resize(old + got);
    if (got < kReadWindow) file_eof = true;
    std::vector<Block> blocks;
    size_t total = 0, consumed = 0;
    if (!scan_bgzf_prefix(comp.data(), comp.size(), &blocks, &total,
                          &consumed)) {
      snprintf(error, sizeof(error), "not a BGZF file");
      return failed = true, false;
    }
    if (file_eof && consumed != comp.size()) {
      snprintf(error, sizeof(error), "truncated BGZF block at EOF");
      return failed = true, false;
    }
    size_t dold = dbuf.size();
    dbuf.resize(dold + total);
    int nt = n_threads < 1 ? 1 : n_threads;
    size_t nb = blocks.size();
    if (nb) {
      std::vector<std::thread> ths;
      size_t per = (nb + nt - 1) / nt;
      for (int t = 0; t < nt; t++) {
        size_t lo = t * per, hi = lo + per < nb ? lo + per : nb;
        if (lo >= hi) break;
        ths.emplace_back([&, lo, hi]() {
          InflateCtx ctx;
          for (size_t i = lo; i < hi; i++) {
            const Block& blk = blocks[i];
            inflate_block(comp.data() + blk.comp_off, blk.comp_len,
                          dbuf.data() + dold + blk.out_off, blk.out_len,
                          ctx.d);
          }
        });
      }
      for (auto& th : ths) th.join();
    }
    comp.erase(comp.begin(), comp.begin() + (ptrdiff_t)consumed);
    return true;
  }
};

extern "C" BamStream* seeksv_bam_open(const char* path, int n_threads,
                                      char* err256) {
  err256[0] = 0;
  BamStream* s = new BamStream();
  s->f = fopen(path, "rb");
  if (!s->f) {
    snprintf(err256, 256, "cannot open file");
    delete s;
    return nullptr;
  }
  if (n_threads < 1) n_threads = (int)std::thread::hardware_concurrency();
  s->n_threads = n_threads < 1 ? 1 : n_threads;
  // pump until the full header (magic + text + refs) is decompressed
  auto have = [&](size_t need) {
    while (s->dbuf.size() < need && !s->file_eof)
      if (!s->pump()) return false;
    return s->dbuf.size() >= need;
  };
  if (!have(12) || memcmp(s->dbuf.data(), "BAM\1", 4) != 0) {
    snprintf(err256, 256, "%s",
             s->failed ? s->error : "bad BAM magic");
    fclose(s->f);
    delete s;
    return nullptr;
  }
  int32_t l_text;
  memcpy(&l_text, s->dbuf.data() + 4, 4);
  size_t off = 8 + (size_t)l_text;
  if (!have(off + 4)) goto trunc;
  memcpy(&s->n_refs, s->dbuf.data() + off, 4);
  off += 4;
  for (int i = 0; i < s->n_refs; i++) {
    if (!have(off + 4)) goto trunc;
    int32_t l_name;
    memcpy(&l_name, s->dbuf.data() + off, 4);
    off += 4;
    if (!have(off + (size_t)l_name + 4)) goto trunc;
    s->ref_names.append((const char*)s->dbuf.data() + off, (size_t)l_name);
    off += (size_t)l_name;
    int32_t l_ref;
    memcpy(&l_ref, s->dbuf.data() + off, 4);
    s->ref_lens.push_back(l_ref);
    off += 4;
  }
  s->dbuf.erase(s->dbuf.begin(), s->dbuf.begin() + (ptrdiff_t)off);
  return s;
trunc:
  snprintf(err256, 256, "%s",
           s->failed ? s->error : "truncated BAM header");
  fclose(s->f);
  delete s;
  return nullptr;
}

// Next chunk of up to max_records records; out->n == 0 at clean EOF;
// out->error set on failure.  Chunk boundaries fall between records only.
// decode_flags bit0: lazy seq/qual (see fill_records).
static BamSoA* bam_next_impl(BamStream* s, int64_t max_records,
                             int32_t decode_flags) {
  BamSoA* out = (BamSoA*)calloc(1, sizeof(BamSoA));
  std::vector<const uint8_t*> rec_ptrs;
  size_t pos = 0;
  for (;;) {
    // parse complete records currently buffered
    while ((int64_t)rec_ptrs.size() < max_records) {
      if (pos + 4 > s->dbuf.size()) break;
      int32_t bs;
      memcpy(&bs, s->dbuf.data() + pos, 4);
      if (bs < 32) return fail(out, "corrupt BAM record");
      if (pos + 4 + (size_t)bs > s->dbuf.size()) break;
      rec_ptrs.push_back(s->dbuf.data() + pos);
      pos += 4 + (size_t)bs;
    }
    if ((int64_t)rec_ptrs.size() >= max_records || s->file_eof) break;
    // need more bytes; pumping reallocates dbuf -> record offsets, not
    // pointers, must survive: rebase after pump
    std::vector<size_t> offs;
    offs.reserve(rec_ptrs.size());
    for (const uint8_t* r : rec_ptrs) offs.push_back((size_t)(r - s->dbuf.data()));
    if (!s->pump()) return fail(out, s->error);
    rec_ptrs.clear();
    for (size_t o : offs) rec_ptrs.push_back(s->dbuf.data() + o);
  }
  if (s->file_eof && rec_ptrs.empty() && pos < s->dbuf.size())
    return fail(out, "truncated BAM record at EOF");
  out->n_refs = s->n_refs;
  out->ref_lens = (int32_t*)malloc(4 * (s->n_refs ? s->n_refs : 1));
  memcpy(out->ref_lens, s->ref_lens.data(), 4 * (size_t)s->n_refs);
  out->ref_names_len = (int64_t)s->ref_names.size();
  out->ref_names = (uint8_t*)malloc(s->ref_names.size() ? s->ref_names.size() : 1);
  memcpy(out->ref_names, s->ref_names.data(), s->ref_names.size());
  fill_records(rec_ptrs, out, s->n_threads, nullptr, decode_flags & 1);
  s->dbuf.erase(s->dbuf.begin(), s->dbuf.begin() + (ptrdiff_t)pos);
  return out;
}

extern "C" BamSoA* seeksv_bam_next(BamStream* s, int64_t max_records) {
  return bam_next_impl(s, max_records, 0);
}

extern "C" BamSoA* seeksv_bam_next2(BamStream* s, int64_t max_records,
                                    int32_t decode_flags) {
  return bam_next_impl(s, max_records, decode_flags);
}

extern "C" void seeksv_bam_close(BamStream* s) {
  if (!s) return;
  if (s->f) fclose(s->f);
  delete s;
}

// Fixed-shape BAM record packing (simulator bulk path: full-length-M
// reads with fixed-width "sim_%010d" qnames).  One contiguous pass per
// record instead of ~30 strided numpy column writes.
extern "C" void seeksv_pack_sim_records(
    int64_t n, int32_t read_len, const int32_t* tid, const int32_t* pos,
    const int32_t* mtid, const int32_t* mpos, const uint16_t* flag,
    const int32_t* isize, const int64_t* qk, const uint8_t* seq,
    uint8_t* out, int n_threads) {
  const int32_t QN = 15;  // "sim_%010d" + NUL
  const int32_t packed_len = (read_len + 1) / 2;
  const int64_t rec = 4 + 32 + QN + 4 + packed_len + read_len;
  static const uint8_t code_of[256] = {0};
  // ASCII -> 4-bit nt16 code
  uint8_t lut[256];
  memset(lut, 15, sizeof(lut));
  const char* syms = "=ACMGRSVTWYHKDBN";
  for (int i = 0; i < 16; i++) lut[(uint8_t)syms[i]] = (uint8_t)i;
  (void)code_of;
  if (n_threads < 1) n_threads = (int)std::thread::hardware_concurrency();
  if (n_threads < 1) n_threads = 1;
  if ((int64_t)n_threads > n) n_threads = (int)(n > 0 ? n : 1);
  auto work = [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; i++) {
      uint8_t* r = out + i * rec;
      int32_t bs = (int32_t)(rec - 4);
      memcpy(r, &bs, 4);
      memcpy(r + 4, &tid[i], 4);
      memcpy(r + 8, &pos[i], 4);
      r[12] = (uint8_t)QN;
      r[13] = 60;  // mapq
      r[14] = r[15] = 0;  // bin
      uint16_t ncig = 1;
      memcpy(r + 16, &ncig, 2);
      memcpy(r + 18, &flag[i], 2);
      memcpy(r + 20, &read_len, 4);
      memcpy(r + 24, &mtid[i], 4);
      memcpy(r + 28, &mpos[i], 4);
      memcpy(r + 32, &isize[i], 4);
      memcpy(r + 36, "sim_", 4);
      int64_t d = qk[i];
      for (int k = 9; k >= 0; k--) {
        r[40 + k] = (uint8_t)('0' + d % 10);
        d /= 10;
      }
      r[50] = 0;
      uint32_t cig = ((uint32_t)read_len << 4);  // <len>M
      memcpy(r + 51, &cig, 4);
      const uint8_t* sq = seq + i * read_len;
      uint8_t* pk = r + 55;
      int32_t half = read_len / 2;
      for (int32_t k = 0; k < half; k++)
        pk[k] = (uint8_t)((lut[sq[2 * k]] << 4) | lut[sq[2 * k + 1]]);
      if (read_len & 1) pk[half] = (uint8_t)(lut[sq[read_len - 1]] << 4);
      memset(r + 55 + packed_len, 40, (size_t)read_len);  // qual 'I'-33
    }
  };
  if (n_threads == 1) {
    work(0, n);
  } else {
    std::vector<std::thread> ths;
    int64_t per = (n + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; t++) {
      int64_t lo = t * per, hi = lo + per < n ? lo + per : n;
      if (lo >= hi) break;
      ths.emplace_back(work, lo, hi);
    }
    for (auto& th : ths) th.join();
  }
}

// ---------------------------------------------------------------------------
// BGZF compression (writer hot path: simulator output, BAM writing).
// Splits `data` into <=block_size chunks, deflates each independently
// (threads), emits the BGZF framing.  Returns bytes written, or -1 when
// out_cap is too small (caller sizes via seeksv_bgzf_bound).

namespace {
constexpr int64_t kBgzfBlock = 60000;

#ifdef USE_LIBDEFLATE
static size_t deflate_one_ld(const uint8_t* src, size_t n, uint8_t* dst,
                             size_t cap, libdeflate_compressor* c) {
  return libdeflate_deflate_compress(c, src, n, dst, cap);  // 0 on failure
}
#endif

static size_t deflate_one(const uint8_t* src, size_t n, int level,
                          uint8_t* dst, size_t cap) {
#ifdef USE_LIBDEFLATE
  libdeflate_compressor* c = libdeflate_alloc_compressor(level);
  size_t out = libdeflate_deflate_compress(c, src, n, dst, cap);
  libdeflate_free_compressor(c);
  return out;  // 0 on failure
#else
  z_stream zs;
  memset(&zs, 0, sizeof(zs));
  if (deflateInit2(&zs, level, Z_DEFLATED, -15, 8, Z_DEFAULT_STRATEGY) != Z_OK)
    return 0;
  zs.next_in = const_cast<uint8_t*>(src);
  zs.avail_in = (uInt)n;
  zs.next_out = dst;
  zs.avail_out = (uInt)cap;
  int ret = deflate(&zs, Z_FINISH);
  size_t out = cap - zs.avail_out;
  deflateEnd(&zs);
  return ret == Z_STREAM_END ? out : 0;
#endif
}

uint32_t crc32_one(const uint8_t* src, size_t n) {
#ifdef USE_LIBDEFLATE
  return libdeflate_crc32(0, src, n);
#else
  return (uint32_t)crc32(0L, src, (uInt)n);
#endif
}
}  // namespace

extern "C" int64_t seeksv_bgzf_bound(int64_t n) {
  int64_t blocks = (n + kBgzfBlock - 1) / kBgzfBlock;
  if (blocks < 1) blocks = 1;
  return n + blocks * (kBgzfBlock / 4 + 64);
}

extern "C" int64_t seeksv_bgzf_compress(const uint8_t* data, int64_t n,
                                        int level, uint8_t* out,
                                        int64_t out_cap, int n_threads) {
  int64_t nb = (n + kBgzfBlock - 1) / kBgzfBlock;
  if (nb == 0) return 0;
  if (n_threads < 1) n_threads = (int)std::thread::hardware_concurrency();
  if (n_threads < 1) n_threads = 1;
  if ((int64_t)n_threads > nb) n_threads = (int)nb;
  // per-block worst-case slot in a scratch buffer, then compact
  const int64_t slot = kBgzfBlock + kBgzfBlock / 4 + 64;
  std::vector<uint8_t> scratch((size_t)(nb * slot));
  std::vector<int64_t> lens((size_t)nb, -1);
  auto work = [&](int64_t b0, int64_t b1) {
#ifdef USE_LIBDEFLATE
    libdeflate_compressor* lc = libdeflate_alloc_compressor(level);
#endif
    for (int64_t b = b0; b < b1; b++) {
      const uint8_t* src = data + b * kBgzfBlock;
      size_t len = (size_t)std::min(kBgzfBlock, n - b * kBgzfBlock);
      uint8_t* dst = scratch.data() + b * slot;
#ifdef USE_LIBDEFLATE
      size_t comp = deflate_one_ld(src, len, dst + 18,
                                   (size_t)slot - 26, lc);
#else
      size_t comp = deflate_one(src, len, level, dst + 18, (size_t)slot - 26);
#endif
      if (comp == 0 || comp + 26 > 65536) {  // fall back to stored blocks
        // deflate "stored" framing done by zlib at level 0 always fits
        comp = deflate_one(src, len, 0, dst + 18, (size_t)slot - 26);
        if (comp == 0 || comp + 26 > 65536) {
          lens[(size_t)b] = -1;
          continue;
        }
      }
      size_t bsize = comp + 26;
      dst[0] = 0x1f; dst[1] = 0x8b; dst[2] = 8; dst[3] = 4;
      memset(dst + 4, 0, 5);
      dst[9] = 0xff;
      uint16_t xlen = 6;
      memcpy(dst + 10, &xlen, 2);
      dst[12] = 'B'; dst[13] = 'C';
      uint16_t two = 2, bs16 = (uint16_t)(bsize - 1);
      memcpy(dst + 14, &two, 2);
      memcpy(dst + 16, &bs16, 2);
      uint32_t crc = crc32_one(src, len);
      uint32_t isize = (uint32_t)len;
      memcpy(dst + 18 + comp, &crc, 4);
      memcpy(dst + 22 + comp, &isize, 4);
      lens[(size_t)b] = (int64_t)bsize;
    }
#ifdef USE_LIBDEFLATE
    libdeflate_free_compressor(lc);
#endif
  };
  {
    std::vector<std::thread> ths;
    int64_t per = (nb + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; t++) {
      int64_t lo = t * per, hi = lo + per < nb ? lo + per : nb;
      if (lo >= hi) break;
      ths.emplace_back(work, lo, hi);
    }
    for (auto& th : ths) th.join();
  }
  (void)level;
  int64_t total = 0;
  for (int64_t b = 0; b < nb; b++) {
    if (lens[(size_t)b] < 0) return -1;
    if (total + lens[(size_t)b] > out_cap) return -1;
    memcpy(out + total, scratch.data() + b * slot, (size_t)lens[(size_t)b]);
    total += lens[(size_t)b];
  }
  return total;
}

// Coverage accumulation: diff[start] += w; diff[end] -= w over segments.
void seeksv_coverage_diff(const int64_t* starts, const int64_t* ends,
                          const int32_t* weights, int64_t n_seg,
                          int32_t* diff, int64_t len) {
  for (int64_t i = 0; i < n_seg; i++) {
    int64_t s = starts[i], e = ends[i];
    if (s < 0) s = 0;
    if (s > len) s = len;
    if (e < 0) e = 0;
    if (e > len) e = len;
    diff[s] += weights[i];
    diff[e] -= weights[i];
  }
}

}  // extern "C" — paused for C++ includes; reopened below

// ---------------------------------------------------------------------------
// getclip consensus merge (host streaming hot path).
//
// The ordered per-breakpoint multimap with the v1.2.0 oracle's greedy
// first-match longest-wins merge (ref InsertSeq clip_reads.cpp:260-283;
// replace semantics established by probing the shipped binary — see
// pipeline/getclip.py docstrings).  The python BreakpointMap is the
// oracle; byte equality is asserted by the golden getclip tests and the
// adversarial-slab stream tests.  One batched call per record run
// replaces ~200k python map probes per 100 Mbp slab pass.

#include <map>

namespace {

struct ClipEntry {
  std::string sl, ql, sr, qr;                    // left/right seq + qual
  std::vector<std::pair<int32_t, char>> cig;     // S/H-stripped pairs
  int64_t support = 1;
};

struct ClipMapH {
  double limit;
  std::map<int64_t, std::vector<ClipEntry>> side[2];  // 0 = left, 1 = right
};

inline bool rate_ok(const std::string& a, const std::string& b,
                    bool end_first, double limit) {
  // CompareStringEndFirst/BeginFirst (ref clip_reads.cpp:194-217):
  // match fraction over the shorter length; n == 0 -> NaN -> false
  const size_t n = std::min(a.size(), b.size());
  if (n == 0) return false;
  const char* pa = end_first ? a.data() + a.size() - n : a.data();
  const char* pb = end_first ? b.data() + b.size() - n : b.data();
  int64_t m = 0;
  for (size_t i = 0; i < n; i++) m += pa[i] == pb[i];
  return (double)m / (double)n >= limit;
}

const char kCigOps[10] = "MIDNSHP=X";

}  // namespace

extern "C" void* seeksv_clipmap_new(double limit) {
  ClipMapH* h = new ClipMapH();
  h->limit = limit;
  return h;
}

extern "C" void seeksv_clipmap_free(void* hp) {
  delete (ClipMapH*)hp;
}

// Batched inserts, candidate rows in stream order.  Row c splits record
// rec[c]: s_l = seq[a:ms], s_r = seq[ms:me] (record-relative); qual
// phred+33 or "*" when the record's qual is the 0xFF sentinel; the
// entry's CIGAR is the record's with S/H stripped.
extern "C" void seeksv_clipmap_insert_slab(
    void* hp, const uint8_t* seq, const uint8_t* qual,
    const int64_t* seq_off, const uint32_t* cig, const int64_t* cig_off,
    int64_t n_cand, const int64_t* rec, const int32_t* side,
    const int64_t* pos, const int32_t* a, const int32_t* ms,
    const int32_t* me, const uint8_t* leftclip) {
  ClipMapH* h = (ClipMapH*)hp;
  std::string sl, ql, sr, qr;
  for (int64_t c = 0; c < n_cand; c++) {
    const int64_t r = rec[c];
    const int64_t base = seq_off[r];
    const int64_t qlen = seq_off[r + 1] - base;
    const bool no_qual = qlen > 0 && qual[base] == 0xFF;
    sl.assign((const char*)seq + base + a[c], (size_t)(ms[c] - a[c]));
    sr.assign((const char*)seq + base + ms[c], (size_t)(me[c] - ms[c]));
    if (no_qual) {
      ql = "*";
      qr = "*";
    } else {
      ql.resize(sl.size());
      for (size_t i = 0; i < sl.size(); i++)
        ql[i] = (char)(qual[base + a[c] + i] + 33);
      qr.resize(sr.size());
      for (size_t i = 0; i < sr.size(); i++)
        qr[i] = (char)(qual[base + ms[c] + i] + 33);
    }
    const bool lc = leftclip[c] != 0;
    auto& entries = h->side[side[c]][pos[c]];
    bool merged = false;
    for (ClipEntry& e : entries) {
      if (rate_ok(sl, e.sl, true, h->limit)
          && rate_ok(sr, e.sr, false, h->limit)) {
        // v1.2.0 replace merge: each side replaced wholesale by a
        // strictly longer incoming side; CIGAR follows the aligned side
        bool grew_l = sl.size() > e.sl.size();
        bool grew_r = sr.size() > e.sr.size();
        if (grew_l) { e.sl = sl; e.ql = ql; }
        if (grew_r) { e.sr = sr; e.qr = qr; }
        if ((grew_l && !lc) || (grew_r && lc)) {
          e.cig.clear();
          for (int64_t x = cig_off[r]; x < cig_off[r + 1]; x++) {
            const uint32_t op = cig[x] & 0xF;
            if (op == 4 || op == 5) continue;  // S, H
            e.cig.emplace_back((int32_t)(cig[x] >> 4), kCigOps[op]);
          }
        }
        e.support++;
        merged = true;
        break;
      }
    }
    if (!merged) {
      entries.emplace_back();
      ClipEntry& e = entries.back();
      e.sl = sl; e.ql = ql; e.sr = sr; e.qr = qr;
      for (int64_t x = cig_off[r]; x < cig_off[r + 1]; x++) {
        const uint32_t op = cig[x] & 0xF;
        if (op == 4 || op == 5) continue;
        e.cig.emplace_back((int32_t)(cig[x] >> 4), kCigOps[op]);
      }
    }
  }
}

// Flush: serialize both sides (left/'5' then right/'3', positions
// ascending, entries in insertion order) as the clip.gz text and the
// clip.fq text (ref DisplaySClipReadsAndClipFq clip_reads.h:300-345),
// then clear the maps.  Returns malloc'd buffers (caller frees via
// seeksv_blob_free).
extern "C" void seeksv_clipmap_flush(void* hp, const char* chrom,
                                     uint8_t** soft_out, int64_t* soft_len,
                                     uint8_t** fq_out, int64_t* fq_len) {
  ClipMapH* h = (ClipMapH*)hp;
  std::string soft, fq;
  char num[32];
  for (int s = 0; s < 2; s++) {
    const char orient = s == 0 ? '5' : '3';
    for (auto& kv : h->side[s]) {
      for (ClipEntry& e : kv.second) {
        const std::string& aligned = s == 0 ? e.sr : e.sl;
        const std::string& aligned_q = s == 0 ? e.qr : e.ql;
        const std::string& clipped = s == 0 ? e.sl : e.sr;
        const std::string& clipped_q = s == 0 ? e.ql : e.qr;
        soft += chrom;
        soft += '\t';
        snprintf(num, sizeof(num), "%lld", (long long)kv.first);
        soft += num;
        soft += '\t';
        soft += orient;
        soft += '\t';
        for (auto& p : e.cig) {
          snprintf(num, sizeof(num), "%d", p.first);
          soft += num;
          soft += p.second;
        }
        soft += '\t';
        soft += aligned;
        soft += '\t';
        soft += aligned_q;
        soft += '\t';
        soft += clipped;
        soft += '\t';
        soft += clipped_q;
        soft += '\t';
        snprintf(num, sizeof(num), "%lld", (long long)e.support);
        soft += num;
        soft += '\n';
        fq += '@';
        fq += clipped;
        fq += '\n';
        fq += clipped;
        fq += "\n+\n";
        fq += clipped_q;
        fq += '\n';
      }
    }
    h->side[s].clear();
  }
  *soft_len = (int64_t)soft.size();
  *soft_out = (uint8_t*)malloc(soft.size() ? soft.size() : 1);
  memcpy(*soft_out, soft.data(), soft.size());
  *fq_len = (int64_t)fq.size();
  *fq_out = (uint8_t*)malloc(fq.size() ? fq.size() : 1);
  memcpy(*fq_out, fq.data(), fq.size());
}

extern "C" void seeksv_blob_free(uint8_t* p) { free(p); }

extern "C" {  // — reopened (paused above for C++ includes)

// Prefix sums (np.cumsum is a scalar-op loop in this numpy build: ~4 s
// per 100M int32 on the 2-vCPU host; these run at memory bandwidth).
void seeksv_prefix_sum_i32(const int32_t* in, int64_t n, int32_t* out) {
  int32_t acc = 0;
  for (int64_t i = 0; i < n; i++) {
    acc += in[i];
    out[i] = acc;
  }
}

// Exclusive 64-bit prefix (out[0] = 0, out[i+1] = sum(in[:i+1])); out has
// capacity n+1.  The DepthQuery range-sum table form.
void seeksv_prefix_excl_i64(const int32_t* in, int64_t n, int64_t* out) {
  int64_t acc = 0;
  out[0] = 0;
  for (int64_t i = 0; i < n; i++) {
    acc += in[i];
    out[i + 1] = acc;
  }
}

// Fused discordant-counter base mask (ref FindDiscordantReadPairs gates,
// getsv.cpp:1027-1060 + IsConcordant cluster.cpp:136-147): one pass over
// the SoA columns instead of ~15 boolean-temporary numpy passes.
void seeksv_discordant_base_ok(const int32_t* flag, const int32_t* mapq,
                               const int32_t* isize, const uint8_t* hard,
                               int64_t n, int32_t min_mapq, int64_t min_ins,
                               int64_t max_ins, int32_t skip_hard,
                               uint8_t* out) {
  for (int64_t i = 0; i < n; i++) {
    const int32_t f = flag[i];
    const bool fwd = (f & 0x10) == 0;
    const bool mfwd = (f & 0x20) == 0;
    const int64_t is = isize[i];
    const bool conc =
        (fwd && !mfwd && min_ins <= is && is <= max_ins) ||
        (!fwd && mfwd && is < 0 && min_ins <= -is && -is <= max_ins);
    bool ok = mapq[i] >= min_mapq && (f & (0x400 | 0x4 | 0x8)) == 0 && !conc;
    if (skip_hard && hard[i]) ok = false;
    out[i] = ok;
  }
}

// Single-pass pileup-depth accumulation straight from the decoded SoA
// columns (ref role: bam2depth.cpp:75-129): for every record passing the
// mapQ gate and BAM_DEF_MASK, each M/=/X cigar segment contributes
// diff[start] += 1, diff[end] -= 1 into one flat per-genome diff buffer
// (tid_base[t] = offset of chromosome t; each chromosome owns len+1
// slots so the end-slot of a full-length segment stays in range).
// Replaces the numpy per-op expansion (repeat/cumsum over every cigar op)
// that cost ~8 s per 28M records on the streaming stats path.
void seeksv_depth_diff_soa(const int32_t* flag, const int32_t* tid,
                           const int32_t* pos, const int32_t* mapq,
                           const uint32_t* cig, const int64_t* cig_off,
                           int64_t n, int32_t min_mapq,
                           const int64_t* tid_base, int32_t n_refs,
                           const int32_t* ref_lens, int32_t* diff) {
  // BAM_DEF_MASK = UNMAP|SECONDARY|QCFAIL|DUP (ref: sam/bam.h:124)
  constexpr int32_t kDefMask = 0x4 | 0x100 | 0x200 | 0x400;
  for (int64_t i = 0; i < n; i++) {
    if (mapq[i] < min_mapq || (flag[i] & kDefMask) != 0) continue;
    const int32_t t = tid[i];
    if (t < 0 || t >= n_refs) continue;
    const int64_t base = tid_base[t];
    const int64_t L = ref_lens[t];
    int64_t p = pos[i];
    for (int64_t c = cig_off[i]; c < cig_off[i + 1]; c++) {
      const uint32_t op = cig[c] & 0xF;
      const int64_t len = cig[c] >> 4;
      // M/=/X contribute depth; M/D/N/=/X consume reference
      if (op == 0 || op == 7 || op == 8) {
        int64_t s = p < 0 ? 0 : (p > L ? L : p);
        int64_t e = p + len < 0 ? 0 : (p + len > L ? L : p + len);
        diff[base + s] += 1;
        diff[base + e] -= 1;
        p += len;
      } else if (op == 2 || op == 3) {
        p += len;
      }
    }
  }
}

// Depth segments in genome-flat coordinates: one (flat_start, flat_end)
// pair per M/=/X cigar segment of every record passing the mapQ +
// BAM_DEF_MASK gate, clipped to the owning chromosome (the host prep of
// the SPMD genome-sharded coverage scatter, parallel/spmd_pipeline.py
// _flat_segments).  Returns the segment count; out arrays must have
// capacity = total cigar ops.  Replaces the numpy repeat+cumsum
// expansion (np.cumsum is a scalar loop on this host).
int64_t seeksv_depth_segments_flat(
    const int32_t* flag, const int32_t* tid, const int32_t* pos,
    const int32_t* mapq, const uint32_t* cig, const int64_t* cig_off,
    int64_t n, int32_t min_mapq, const int64_t* offsets,
    const int32_t* ref_lens, int32_t n_refs,
    int64_t* out_start, int64_t* out_end) {
  constexpr int32_t kDefMask = 0x4 | 0x100 | 0x200 | 0x400;
  int64_t k = 0;
  for (int64_t i = 0; i < n; i++) {
    if (mapq[i] < min_mapq || (flag[i] & kDefMask) != 0) continue;
    const int32_t t = tid[i];
    if (t < 0 || t >= n_refs) continue;
    const int64_t off = offsets[t];
    const int64_t L = ref_lens[t];
    int64_t p = pos[i];
    for (int64_t c = cig_off[i]; c < cig_off[i + 1]; c++) {
      const uint32_t op = cig[c] & 0xF;
      const int64_t len = cig[c] >> 4;
      if (op == 0 || op == 7 || op == 8) {       // M/=/X
        int64_t s = p < 0 ? 0 : (p > L ? L : p);
        int64_t e = p + len < 0 ? 0 : (p + len > L ? L : p + len);
        out_start[k] = off + s;
        out_end[k] = off + e;
        k++;
        p += len;
      } else if (op == 2 || op == 3) {           // D/N
        p += len;
      }
    }
  }
  return k;
}

// The two derived per-record columns StreamStats needs each slab
// (pipeline/stream.py): end[i] = pos[i] + reference span (M/D/N/=/X
// consume, bam_calend semantics) and hard[i] = record has a cigar whose
// first or last op is H.  The numpy forms cost a cumsum over the cigar
// stream (a scalar loop on this host) plus several gathers per slab.
void seeksv_stream_end_hard(const int32_t* pos, const uint32_t* cig,
                            const int64_t* cig_off, int64_t n,
                            int32_t* end, uint8_t* hard,
                            int32_t n_threads) {
  if (n_threads <= 0) {
    n_threads = (int32_t)std::thread::hardware_concurrency();
    if (n_threads <= 0) n_threads = 1;
  }
  auto worker = [&](int64_t a, int64_t b) {
    for (int64_t i = a; i < b; i++) {
      const int64_t c0 = cig_off[i], c1 = cig_off[i + 1];
      int64_t span = 0;
      for (int64_t c = c0; c < c1; c++) {
        const uint32_t op = cig[c] & 0xF;
        if (op == 0 || op == 2 || op == 3 || op == 7 || op == 8)
          span += cig[c] >> 4;
      }
      end[i] = pos[i] + (int32_t)span;
      hard[i] = (c1 > c0) && (((cig[c0] & 0xF) == 5) ||
                              ((cig[c1 - 1] & 0xF) == 5));
    }
  };
  if (n_threads == 1 || n < 100000) {
    worker(0, n);
    return;
  }
  std::vector<std::thread> ths;
  const int64_t chunk = (n + n_threads - 1) / n_threads;
  for (int32_t t = 0; t < n_threads; t++) {
    const int64_t a = t * chunk;
    const int64_t b = a + chunk < n ? a + chunk : n;
    if (a >= b) break;
    ths.emplace_back(worker, a, b);
  }
  for (auto& th : ths) th.join();
}

// NM from cigar runs (engine contract: mismatches on M columns +
// inserted + deleted bases) for device-finalized jobs — the device walk
// emits runs without per-step base compares; this host pass supplies
// the NM column.  Row b: query[q_off[b]:q_off[b+1]] vs
// target[t_off[b]:t_off[b+1]], runs rlen/rop[r_off[b]:r_off[b+1]]
// (op 0=M, 1=I, 2=D).
void seeksv_nm_from_runs(const int32_t* q, const int64_t* q_off,
                         const int32_t* t, const int64_t* t_off,
                         int64_t B, const int32_t* rlen,
                         const uint8_t* rop, const int64_t* r_off,
                         int32_t* nm) {
  for (int64_t b = 0; b < B; b++) {
    const int32_t* qb = q + q_off[b];
    const int32_t* tb = t + t_off[b];
    int64_t qi = 0, ti = 0;
    int32_t mm = 0;
    for (int64_t r = r_off[b]; r < r_off[b + 1]; r++) {
      const int32_t ln = rlen[r];
      switch (rop[r]) {
        case 0:
          for (int32_t x = 0; x < ln; x++)
            if (qb[qi + x] != tb[ti + x]) mm++;
          qi += ln;
          ti += ln;
          break;
        case 1:
          mm += ln;
          qi += ln;
          break;
        case 2:
          mm += ln;
          ti += ln;
          break;
      }
    }
    nm[b] = mm;
  }
}

// Fused scatter + prefix-sum: depth[i] = number of segments covering i,
// for i in [0, L).  depth must be zero-initialised with capacity L+1
// (the +1 slot absorbs clipped scatter ends).  Replaces the
// coverage_diff + np.cumsum pair on the pileup-depth hot path
// (ref role: bam2depth.cpp:75-129).
void seeksv_coverage_depth(const int64_t* starts, const int64_t* ends,
                           const int32_t* weights, int64_t n_seg,
                           int32_t* depth, int64_t L) {
  for (int64_t i = 0; i < n_seg; i++) {
    int64_t s = starts[i], e = ends[i];
    if (s < 0) s = 0;
    if (s > L) s = L;
    if (e < 0) e = 0;
    if (e > L) e = L;
    depth[s] += weights[i];
    depth[e] -= weights[i];
  }
  int32_t acc = 0;
  for (int64_t i = 0; i < L; i++) {
    acc += depth[i];
    depth[i] = acc;
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Smith-Waterman kernels (host fast path of seeksv_tpu/align).
//
// seeksv_sw_extend_batch reproduces seeksv_tpu/align/sw.py:extend_batch_np
// exactly (the batched ksw_extend-style anchored extension used by the
// realignment engine, ref role: bwa mem_chain2aln); the device (XLA/Pallas)
// kernels share these semantics, asserted by tests/test_native.py.
//
// Scoring constants mirror sw.py (bwa-mem 0.7.x defaults).

namespace {
constexpr int32_t kMatch = 1;
constexpr int32_t kMismatch = 4;
constexpr int32_t kGapOpen = 6;
constexpr int32_t kGapExt = 1;
constexpr int32_t kAmbig = -1;
constexpr int32_t kNegInf = -0x40000000;

inline int32_t sub_score(int32_t a, int32_t b) {
  if (a > 3 || b > 3) return kAmbig;
  return a == b ? kMatch : -kMismatch;
}

void sw_extend_one(const int32_t* q, int32_t qlen, const int32_t* t,
                   int32_t tlen, int32_t h0, int32_t zdrop, int32_t* out5,
                   int32_t* h, int32_t* e) {
  // out5: max_score, qle, tle, gscore, gtle
  int32_t best = h0, qle = 0, tle = 0, gscore = kNegInf, gtle = 0;
  // row init (h[j] = h0 - open - j*ext while >= 0)
  h[0] = h0;
  for (int32_t j = 1; j <= qlen; j++) {
    int32_t v = h0 - kGapOpen - j * kGapExt;
    h[j] = v >= 0 ? v : kNegInf;
  }
  for (int32_t j = 0; j <= qlen; j++) e[j] = kNegInf;
  for (int32_t i = 1; i <= tlen; i++) {
    const int32_t tb = t[i - 1];
    const int32_t h0_col = h0 - kGapOpen - i * kGapExt;
    int32_t hdiag = h[0];
    int32_t m = kNegInf;  // running max_{k<j} (g_k + k*ext)
    int32_t row_best = kNegInf, row_amax = 0;
    for (int32_t j = 1; j <= qlen; j++) {
      const int32_t diag = hdiag + sub_score(q[j - 1], tb);
      const int32_t ecand =
          (h[j] - kGapOpen > e[j] ? h[j] - kGapOpen : e[j]) - kGapExt;
      const int32_t g = diag > ecand ? diag : ecand;
      const int32_t f = m - kGapOpen - j * kGapExt;
      const int32_t nh = g > f ? g : f;
      hdiag = h[j];
      h[j] = nh;
      e[j] = ecand;
      const int32_t u = g + j * kGapExt;
      if (u > m) m = u;
      if (nh > row_best) {
        row_best = nh;
        row_amax = j;
      }
    }
    h[0] = h0_col;
    const int32_t h_at_qlen = qlen == 0 ? h0_col : h[qlen];
    if (row_best > best) {
      best = row_best;
      qle = row_amax;
      tle = i;
    }
    if (h_at_qlen > gscore) {
      gscore = h_at_qlen;
      gtle = i;
    }
    if (row_best < best - zdrop) break;
  }
  out5[0] = best;
  out5[1] = qle;
  out5[2] = tle;
  out5[3] = gscore;
  out5[4] = gtle;
}
}  // namespace

extern "C" {

// Batched anchored extension. q: [B, LQ] row-major, t: [B, LT]; out: [B, 5].
void seeksv_sw_extend_batch(const int32_t* q, const int32_t* qlen,
                            const int32_t* t, const int32_t* tlen,
                            const int32_t* h0, int64_t B, int64_t LQ,
                            int64_t LT, int32_t zdrop, int32_t* out,
                            int32_t n_threads) {
  if (n_threads <= 0) {
    n_threads = (int32_t)std::thread::hardware_concurrency();
    if (n_threads <= 0) n_threads = 1;
  }
  if ((int64_t)n_threads > B) n_threads = (int32_t)(B > 0 ? B : 1);
  auto worker = [&](int64_t b0, int64_t b1) {
    std::vector<int32_t> h(LQ + 1), e(LQ + 1);
    for (int64_t b = b0; b < b1; b++) {
      sw_extend_one(q + b * LQ, qlen[b], t + b * LT, tlen[b], h0[b], zdrop,
                    out + b * 5, h.data(), e.data());
    }
  };
  if (n_threads == 1) {
    worker(0, B);
  } else {
    std::vector<std::thread> ths;
    const int64_t chunk = (B + n_threads - 1) / n_threads;
    for (int32_t ti = 0; ti < n_threads; ti++) {
      const int64_t b0 = ti * chunk;
      const int64_t b1 = b0 + chunk < B ? b0 + chunk : B;
      if (b0 >= b1) break;
      ths.emplace_back(worker, b0, b1);
    }
    for (auto& th : ths) th.join();
  }
}

// Global affine alignment with traceback, reproducing
// Banded global DP (one rung of the ladder in seeksv_sw_global below):
// path constraint j - i in [dlo, dhi] with dlo = min(0, n-m) - w,
// dhi = max(0, n-m) + w; banded addressing col = j - i - dlo keeps the
// diagonal move in the SAME column (vertical: col+1, horizontal: col-1).
// Returns the cigar run count and fills *score_out; traceback uses the
// identical preference order to the full-DP form.
static int64_t sw_global_banded(const int32_t* query, int64_t m,
                                const int32_t* target, int64_t n,
                                int64_t w, int32_t* score_out,
                                int32_t* cig_len, uint8_t* cig_op) {
  const int64_t dlo = (n < m ? n - m : 0) - w;
  const int64_t dhi = (n > m ? n - m : 0) + w;
  const int64_t K = dhi - dlo + 1;
  std::vector<int32_t> H((m + 1) * K, kNegInf), E((m + 1) * K, kNegInf),
      F((m + 1) * K, kNegInf);
  auto idx = [&](int64_t i, int64_t j) { return i * K + (j - i - dlo); };
  auto inb = [&](int64_t i, int64_t j) {
    return j >= 0 && j <= n && j - i >= dlo && j - i <= dhi;
  };
  H[idx(0, 0)] = 0;
  for (int64_t j = 1; j <= n && j <= dhi; j++)
    H[idx(0, j)] = E[idx(0, j)] = (int32_t)(-kGapOpen - j * kGapExt);
  for (int64_t i = 1; i <= m; i++) {
    const int64_t jlo = (i + dlo > 1) ? i + dlo : 1;
    const int64_t jhi = (i + dhi < n) ? i + dhi : n;
    const int32_t qi = query[i - 1];
    int64_t m2 = kNegInf;  // max over in-band k<j of H[i][k] + k*ext
    if (i + dlo <= 0) {    // boundary column j=0 inside the band
      const int32_t b = (int32_t)(-kGapOpen - i * kGapExt);
      H[idx(i, 0)] = F[idx(i, 0)] = b;
      m2 = b;  // + 0*ext
    }
    for (int64_t j = jlo; j <= jhi; j++) {
      const int32_t hprev = inb(i - 1, j) ? H[idx(i - 1, j)] : kNegInf;
      const int32_t fprev = inb(i - 1, j) ? F[idx(i - 1, j)] : kNegInf;
      const int32_t f =
          (hprev - kGapOpen > fprev ? hprev - kGapOpen : fprev) - kGapExt;
      F[idx(i, j)] = f;
      const int32_t dprev =
          inb(i - 1, j - 1) ? H[idx(i - 1, j - 1)] : kNegInf;
      const int32_t diag = dprev + sub_score(qi, target[j - 1]);
      const int32_t g = diag > f ? diag : f;
      const int32_t ev = (int32_t)(m2 - kGapOpen - j * kGapExt);
      E[idx(i, j)] = ev;
      H[idx(i, j)] = g > ev ? g : ev;
      const int64_t u = (int64_t)g + j * kGapExt;
      if (u > m2) m2 = u;
    }
  }
  if (!inb(m, n)) return -1;
  *score_out = H[idx(m, n)];
  int64_t i = m, j = n, nc = 0;
  auto push = [&](uint8_t op) {
    if (nc > 0 && cig_op[nc - 1] == op) {
      cig_len[nc - 1]++;
    } else {
      cig_op[nc] = op;
      cig_len[nc] = 1;
      nc++;
    }
  };
  while (i > 0 || j > 0) {
    const int32_t h = inb(i, j) ? H[idx(i, j)] : kNegInf;
    if (i > 0 && j > 0 && inb(i - 1, j - 1) &&
        h == H[idx(i - 1, j - 1)] + sub_score(query[i - 1], target[j - 1])) {
      push('M');
      i--;
      j--;
    } else if (j > 0 && inb(i, j) && h == E[idx(i, j)]) {
      push('D');
      while (j > 1 && inb(i, j - 1) &&
             E[idx(i, j)] == E[idx(i, j - 1)] - kGapExt) {
        push('D');
        j--;
      }
      j--;
    } else if (i > 0 && inb(i, j) && h == F[idx(i, j)]) {
      push('I');
      while (i > 1 && inb(i - 1, j) &&
             F[idx(i, j)] == F[idx(i - 1, j)] - kGapExt) {
        push('I');
        i--;
      }
      i--;
    } else if (i > 0 && j > 0) {
      push('M');
      i--;
      j--;
    } else if (j > 0) {
      push('D');
      j--;
    } else {
      push('I');
      i--;
    }
  }
  for (int64_t a = 0, b = nc - 1; a < b; a++, b--) {
    std::swap(cig_len[a], cig_len[b]);
    std::swap(cig_op[a], cig_op[b]);
  }
  return nc;
}

// seeksv_tpu/align/sw.py:global_align (ksw_global role: CIGAR emission on
// the chosen extents only).  cig_len/cig_op must have capacity m+n; the
// return value is the number of runs emitted (cigar already merged and in
// left-to-right order), and *score_out the terminal score H[m][n].
// m>0 and n>0 are required (degenerate cases stay in the python wrapper).
//
// Long pairs (min(m, n) > 256 — only the long-fragment regime; every
// sound-regime fragment keeps the bit-identical full DP) run a banded
// LADDER: rungs w = 16, 64, 256.  A rung is accepted when either
//   (a) SOUND band-sufficiency: any path leaving band w deviates by
//       >= w+1 diagonals, hence carries >= 2 gap runs totalling
//       >= |n-m| + 2(w+1) gap columns and at most min(m,n) - (w+1)
//       diagonal columns, so its score is bounded by
//         kMatch*(min(m,n)-(w+1)) - 2*kGapOpen - (|n-m|+2(w+1))*kGapExt;
//       a banded score >= that ceiling IS the global optimum score
//       (the emitted traceback is one optimal-score path; tie-breaks
//       among equal-score paths may differ from the full-DP choice), or
//   (b) HEURISTIC: two adjacent rungs report equal scores (emit the
//       smaller rung's traceback).  Equal constrained optima do not
//       prove band sufficiency, so (b) can in principle emit a
//       suboptimal score/CIGAR without falling through to full DP
//       (ADVICE r4) — it is kept as a fallback for the high-divergence
//       regime where (a)'s ceiling is unreachable, and the python
//       oracle implements the identical acceptance order.
// Otherwise full DP.  At long-fragment divergence rung 16 or 64
// accepts and the finalize stage drops ~8x in cells.
int64_t seeksv_sw_global(const int32_t* query, int64_t m,
                         const int32_t* target, int64_t n,
                         int32_t* score_out, int32_t* cig_len,
                         uint8_t* cig_op) {
  if ((m > 256 && n > 256)) {
    static const int64_t rungs[3] = {16, 64, 256};
    const int64_t mn = m < n ? m : n;
    const int64_t ad = m < n ? n - m : m - n;
    std::vector<int32_t> plen(m + n);
    std::vector<uint8_t> pop(m + n);
    int32_t psc = 0;
    int64_t pnc = -1;
    for (int r = 0; r < 3; r++) {
      int32_t sc = 0;
      int64_t nc = sw_global_banded(query, m, target, n, rungs[r], &sc,
                                    cig_len, cig_op);
      if (nc >= 0) {
        const int64_t ceiling = kMatch * (mn - (rungs[r] + 1)) -
                                2 * kGapOpen -
                                (ad + 2 * (rungs[r] + 1)) * kGapExt;
        if ((int64_t)sc >= ceiling) {  // sound acceptance (a)
          *score_out = sc;
          return nc;
        }
      }
      if (r > 0 && pnc >= 0 && nc >= 0 && sc == psc) {
        // heuristic acceptance (b): emit the SMALLER rung's traceback
        std::copy(plen.begin(), plen.begin() + pnc, cig_len);
        std::copy(pop.begin(), pop.begin() + pnc, cig_op);
        *score_out = psc;
        return pnc;
      }
      psc = sc;
      pnc = nc;
      std::copy(cig_len, cig_len + (nc > 0 ? nc : 0), plen.begin());
      std::copy(cig_op, cig_op + (nc > 0 ? nc : 0), pop.begin());
    }
  }
  const int64_t W = n + 1;
  std::vector<int32_t> H((m + 1) * W), E((m + 1) * W), F((m + 1) * W);
  H[0] = 0;
  E[0] = F[0] = kNegInf;
  for (int64_t j = 1; j <= n; j++) {
    H[j] = E[j] = (int32_t)(-kGapOpen - j * kGapExt);
    F[j] = kNegInf;
  }
  for (int64_t i = 1; i <= m; i++) {
    H[i * W] = F[i * W] = (int32_t)(-kGapOpen - i * kGapExt);
    E[i * W] = kNegInf;
    const int32_t qi = query[i - 1];
    int32_t m2 = H[i * W];  // running max for E: max(H[i][0], g_k + k*ext)
    for (int64_t j = 1; j <= n; j++) {
      const int32_t f =
          (H[(i - 1) * W + j] - kGapOpen > F[(i - 1) * W + j]
               ? H[(i - 1) * W + j] - kGapOpen
               : F[(i - 1) * W + j]) -
          kGapExt;
      F[i * W + j] = f;
      const int32_t diag = H[(i - 1) * W + j - 1] + sub_score(qi, target[j - 1]);
      const int32_t g = diag > f ? diag : f;
      const int32_t ev = (int32_t)(m2 - kGapOpen - j * kGapExt);
      E[i * W + j] = ev;
      H[i * W + j] = g > ev ? g : ev;
      const int32_t u = (int32_t)(g + j * kGapExt);
      if (u > m2) m2 = u;
    }
  }
  *score_out = H[m * W + n];
  // traceback (identical preference order to the python reference)
  int64_t i = m, j = n, nc = 0;
  auto push = [&](uint8_t op) {
    if (nc > 0 && cig_op[nc - 1] == op) {
      cig_len[nc - 1]++;
    } else {
      cig_op[nc] = op;
      cig_len[nc] = 1;
      nc++;
    }
  };
  while (i > 0 || j > 0) {
    if (i > 0 && j > 0 &&
        H[i * W + j] ==
            H[(i - 1) * W + j - 1] + sub_score(query[i - 1], target[j - 1])) {
      push('M');
      i--;
      j--;
    } else if (j > 0 && H[i * W + j] == E[i * W + j]) {
      push('D');
      while (j > 1 && E[i * W + j] == E[i * W + j - 1] - kGapExt) {
        push('D');
        j--;
      }
      j--;
    } else if (i > 0 && H[i * W + j] == F[i * W + j]) {
      push('I');
      while (i > 1 && F[i * W + j] == F[(i - 1) * W + j] - kGapExt) {
        push('I');
        i--;
      }
      i--;
    } else if (i > 0 && j > 0) {
      push('M');
      i--;
      j--;
    } else if (j > 0) {
      push('D');
      j--;
    } else {
      push('I');
      i--;
    }
  }
  // reverse runs into left-to-right order
  for (int64_t a = 0, b = nc - 1; a < b; a++, b--) {
    std::swap(cig_len[a], cig_len[b]);
    std::swap(cig_op[a], cig_op[b]);
  }
  return nc;
}

// Batched exact-seed candidate generation (threaded): the native form of
// seeksv_tpu/align/seed_batch.batch_candidates (itself the exact
// vectorization of Aligner._candidates; equivalence asserted by
// tests/test_align.py + tests/test_native.py).  Per read: rolling 2-bit
// k-mer hashes, prefix-bucket-bounded binary search in the sorted key
// table, diagonal grouping with longest-consecutive-offset anchors
// (earliest on ties), votes = hits per diagonal, ranked (-votes, diag),
// top `top` slots emitted.
// v2 packed index (align/index.py): keys_low holds only the hash bits
// below the prefix (uint16 when shift<=16 — every production index —
// else uint32, selected by key_bytes); positions are uint32.  6 B/kmer
// vs the v1 16, halving cold-cache page-in on the 500 Mbp table.
void seeksv_seed_batch(const uint8_t* keys_low, int32_t key_bytes,
                       const uint32_t* positions,
                       int64_t n_keys, const int64_t* prefix_tab,
                       int32_t shift, const uint8_t* reads,
                       const int64_t* read_off, int64_t n_reads, int32_t k,
                       int32_t max_occ, int32_t top, int64_t* out_diag,
                       int32_t* out_qstart, int32_t* out_alen,
                       int32_t* out_votes, int32_t* out_ncand,
                       int32_t n_threads) {
  if (n_threads <= 0) {
    n_threads = (int32_t)std::thread::hardware_concurrency();
    if (n_threads <= 0) n_threads = 1;
  }
  if ((int64_t)n_threads > n_reads) n_threads = (int32_t)(n_reads > 0 ? n_reads : 1);
  auto worker = [&](int64_t r0, int64_t r1) {
    std::vector<std::pair<int64_t, int32_t>> hits;  // (diag, offset)
    struct Cand { int64_t diag; int32_t qs, alen, votes; };
    std::vector<Cand> cands;
    for (int64_t r = r0; r < r1; r++) {
      hits.clear();
      cands.clear();
      const uint8_t* q = reads + read_off[r];
      const int64_t n = read_off[r + 1] - read_off[r];
      out_ncand[r] = 0;
      if (n < k) continue;
      uint64_t h = 0;
      int32_t run_valid = 0;  // consecutive non-ambiguous bases seen
      const uint64_t mask = (k < 32) ? ((1ull << (2 * k)) - 1) : ~0ull;
      for (int64_t i = 0; i < n; i++) {
        const uint8_t c = q[i];
        if (c > 3) {
          run_valid = 0;
          h = 0;
          continue;
        }
        h = ((h << 2) | c) & mask;
        run_valid++;
        if (run_valid < k) continue;
        const int64_t off = i - k + 1;
        const int64_t p = (int64_t)(h >> shift);
        const uint64_t low =
            shift ? (h & ((shift < 64 ? (1ull << shift) : 0ull) - 1)) : 0;
        int64_t lo = prefix_tab[p], hi = prefix_tab[p + 1];
        if (key_bytes == 2) {
          const uint16_t* kk = (const uint16_t*)keys_low;
          const uint16_t q16 = (uint16_t)low;
          lo = std::lower_bound(kk + lo, kk + hi, q16) - kk;
          hi = std::upper_bound(kk + lo, kk + hi, q16) - kk;
        } else {
          const uint32_t* kk = (const uint32_t*)keys_low;
          const uint32_t q32 = (uint32_t)low;
          lo = std::lower_bound(kk + lo, kk + hi, q32) - kk;
          hi = std::upper_bound(kk + lo, kk + hi, q32) - kk;
        }
        const int64_t cnt = hi - lo;
        if (cnt == 0 || cnt > max_occ) continue;
        for (int64_t it = lo; it < hi; ++it)
          hits.emplace_back((int64_t)positions[it] - off, (int32_t)off);
      }
      if (hits.empty()) continue;
      std::sort(hits.begin(), hits.end());
      // per-diagonal: votes + longest consecutive-offset run (earliest
      // on ties: strict > update while scanning ascending offsets)
      size_t a = 0;
      while (a < hits.size()) {
        size_t b = a;
        const int64_t diag = hits[a].first;
        int32_t best_start = hits[a].second, best_len = 1;
        int32_t cur_start = hits[a].second, cur_len = 1;
        while (++b < hits.size() && hits[b].first == diag) {
          if (hits[b].second == hits[b - 1].second + 1) {
            cur_len++;
          } else {
            cur_start = hits[b].second;
            cur_len = 1;
          }
          if (cur_len > best_len) {
            best_len = cur_len;
            best_start = cur_start;
          }
        }
        cands.push_back({diag, best_start,
                         best_len + (int32_t)k - 1, (int32_t)(b - a)});
        a = b;
      }
      std::sort(cands.begin(), cands.end(), [](const Cand& x, const Cand& y) {
        if (x.votes != y.votes) return x.votes > y.votes;
        return x.diag < y.diag;
      });
      const int32_t nc = (int32_t)std::min((size_t)top, cands.size());
      out_ncand[r] = nc;
      for (int32_t c = 0; c < nc; c++) {
        out_diag[r * top + c] = cands[c].diag;
        out_qstart[r * top + c] = cands[c].qs;
        out_alen[r * top + c] = cands[c].alen;
        out_votes[r * top + c] = cands[c].votes;
      }
    }
  };
  if (n_threads == 1) {
    worker(0, n_reads);
  } else {
    std::vector<std::thread> ths;
    const int64_t chunk = (n_reads + n_threads - 1) / n_threads;
    for (int32_t t = 0; t < n_threads; t++) {
      const int64_t b0 = t * chunk;
      const int64_t b1 = b0 + chunk < n_reads ? b0 + chunk : n_reads;
      if (b0 >= b1) break;
      ths.emplace_back(worker, b0, b1);
    }
    for (auto& th : ths) th.join();
  }
}

// Batched global alignment with traceback + NM (threaded): row b aligns
// query[q_off[b]:q_off[b+1]] to target[t_off[b]:t_off[b+1]].  cigar runs
// land in cig_len/cig_op[b*cig_cap : b*cig_cap+ncig[b]]; rows must
// satisfy m+n <= cig_cap (caller sizes cig_cap = max(m+n)).  Rows with
// m==0 or n==0 stay in the python wrapper (as for seeksv_sw_global).
// nm[b] = mismatches on M runs + inserted + deleted bases — the
// engine._nm contract.
void seeksv_sw_global_batch(const int32_t* q, const int64_t* q_off,
                            const int32_t* t, const int64_t* t_off,
                            int64_t B, int32_t* score, int32_t* nm,
                            int64_t* ncig, int32_t* cig_len,
                            uint8_t* cig_op, int64_t cig_cap,
                            int32_t n_threads) {
  if (n_threads <= 0) {
    n_threads = (int32_t)std::thread::hardware_concurrency();
    if (n_threads <= 0) n_threads = 1;
  }
  if ((int64_t)n_threads > B) n_threads = (int32_t)(B > 0 ? B : 1);
  auto worker = [&](int64_t b0, int64_t b1) {
    for (int64_t b = b0; b < b1; b++) {
      const int64_t m = q_off[b + 1] - q_off[b];
      const int64_t n = t_off[b + 1] - t_off[b];
      if (m == 0 || n == 0) {  // wrapper handles the degenerate rows
        ncig[b] = 0;
        score[b] = 0;
        nm[b] = 0;
        continue;
      }
      const int32_t* qb = q + q_off[b];
      const int32_t* tb = t + t_off[b];
      int32_t sc = 0;
      int64_t nc = seeksv_sw_global(qb, m, tb, n, &sc,
                                    cig_len + b * cig_cap,
                                    cig_op + b * cig_cap);
      ncig[b] = nc;
      score[b] = sc;
      int64_t qi = 0, ti = 0;
      int32_t mm = 0;
      for (int64_t c = 0; c < nc; c++) {
        const int32_t ln = cig_len[b * cig_cap + c];
        switch (cig_op[b * cig_cap + c]) {
          case 'M':
            for (int32_t x = 0; x < ln; x++)
              if (qb[qi + x] != tb[ti + x]) mm++;
            qi += ln;
            ti += ln;
            break;
          case 'I':
            mm += ln;
            qi += ln;
            break;
          case 'D':
            mm += ln;
            ti += ln;
            break;
        }
      }
      nm[b] = mm;
    }
  };
  if (n_threads == 1) {
    worker(0, B);
  } else {
    std::vector<std::thread> ths;
    const int64_t chunk = (B + n_threads - 1) / n_threads;
    for (int32_t ti = 0; ti < n_threads; ti++) {
      const int64_t b0 = ti * chunk;
      const int64_t b1 = b0 + chunk < B ? b0 + chunk : B;
      if (b0 >= b1) break;
      ths.emplace_back(worker, b0, b1);
    }
    for (auto& th : ths) th.join();
  }
}

// v2 packed-index builder (align/index.py KmerIndex.build native form):
// radix bucketing by the top `bits` of the 2k-bit rolling hash + tiny
// per-bucket sorts replace the python path's full 8-byte-key mergesort
// (O(n log n) over gigabytes; >1h at 500 Mbp) with ~2 streaming passes:
//   A. per-thread histograms of bucket ids over chromosome-chunked
//      rolling hashes (k-1 overlap keeps the chunks independent),
//   B. per-thread pre-offset scatter of (low-bit residual, position)
//      into bucket slots (thread t's genome range precedes t+1's, so
//      within-bucket entries land in genome order),
//   C. parallel per-bucket sort of (residual, position) pairs — equal
//      hashes keep genome order because positions are unique, matching
//      the python builder's stable argsort exactly.
// keys_low/positions must have capacity sum(len_c - k + 1); returns the
// number of valid kmers written; ptab has (1<<bits)+1 entries.
int64_t seeksv_index_build(const uint8_t* ref, const int64_t* starts,
                           int32_t n_chrom, int32_t k, int32_t bits,
                           uint16_t* keys_low, uint32_t* positions,
                           int64_t* ptab, int32_t n_threads) {
  if (n_threads <= 0) {
    n_threads = (int32_t)std::thread::hardware_concurrency();
    if (n_threads <= 0) n_threads = 1;
  }
  const int32_t shift = 2 * k - bits;   // residual bits (<=16 for u16)
  const uint64_t mask2k = (2 * k < 64) ? ((1ull << (2 * k)) - 1) : ~0ull;
  const uint64_t low_mask = shift > 0 ? ((1ull << shift) - 1) : 0ull;
  const int64_t nb = 1ll << bits;
  // chunk list: (chrom_lo, seg_lo, seg_hi) — kmer START positions in
  // [seg_lo, seg_hi) with the full kmer inside the chromosome
  struct Seg { int64_t c_lo, lo, hi; };
  std::vector<Seg> segs;
  for (int32_t c = 0; c < n_chrom; c++) {
    const int64_t c_lo = starts[c], c_hi = starts[c + 1];
    if (c_hi - c_lo < k) continue;
    const int64_t total = c_hi - c_lo - k + 1;
    const int64_t per = (total + n_threads - 1) / n_threads;
    for (int64_t s = 0; s < total; s += per)
      segs.push_back({c_lo, c_lo + s, c_lo + std::min(s + per, total)});
  }
  const int32_t T = n_threads;
  std::vector<std::vector<int64_t>> hist(T);
  for (auto& h : hist) h.assign(nb, 0);

  auto roll = [&](const Seg& sg, auto&& emit) {
    // rolling hash over kmer starts [sg.lo, sg.hi); ambiguity tracked
    // with a run counter like the seeding kernels
    uint64_t h = 0;
    int32_t run_valid = 0;
    const int64_t first_base = sg.lo;
    for (int64_t i = first_base; i < sg.hi + k - 1; i++) {
      const uint8_t cc = ref[i];
      if (cc > 3) {
        run_valid = 0;
        h = 0;
      } else {
        h = ((h << 2) | cc) & mask2k;
        if (run_valid < k) run_valid++;
      }
      const int64_t p = i - k + 1;   // kmer start for window ending at i
      if (p < sg.lo || p >= sg.hi) continue;
      if (run_valid >= k) emit(p, h);
    }
  };

  auto phase_a = [&](int32_t t) {
    auto& hh = hist[t];
    for (size_t s = t; s < segs.size(); s += T)
      roll(segs[s], [&](int64_t, uint64_t h) { hh[h >> shift]++; });
  };
  {
    std::vector<std::thread> ths;
    for (int32_t t = 0; t < T; t++) ths.emplace_back(phase_a, t);
    for (auto& th : ths) th.join();
  }
  // ptab = exclusive scan over summed histograms; per-(bucket, thread)
  // cursors give each thread disjoint slots in genome order.
  // NOTE segs are interleaved across threads (s % T), so slot order
  // within a bucket is NOT globally genome-ordered across threads —
  // harmless: phase C sorts each bucket by (residual, position) anyway.
  std::vector<std::vector<int64_t>> cur(T);
  for (auto& cvec : cur) cvec.assign(nb, 0);
  int64_t acc = 0;
  for (int64_t b = 0; b < nb; b++) {
    ptab[b] = acc;
    for (int32_t t = 0; t < T; t++) {
      const int64_t cnt = hist[t][b];
      cur[t][b] = acc;
      acc += cnt;
    }
  }
  ptab[nb] = acc;
  auto phase_b = [&](int32_t t) {
    auto& cvec = cur[t];
    for (size_t s = t; s < segs.size(); s += T)
      roll(segs[s], [&](int64_t p, uint64_t h) {
        const int64_t slot = cvec[h >> shift]++;
        keys_low[slot] = (uint16_t)(h & low_mask);
        positions[slot] = (uint32_t)p;
      });
  };
  {
    std::vector<std::thread> ths;
    for (int32_t t = 0; t < T; t++) ths.emplace_back(phase_b, t);
    for (auto& th : ths) th.join();
  }
  // phase C: per-bucket (residual, position) sort
  auto phase_c = [&](int32_t t) {
    std::vector<uint64_t> tmp;
    for (int64_t b = t; b < nb; b += T) {
      const int64_t lo = ptab[b], hi = ptab[b + 1];
      const int64_t n = hi - lo;
      if (n <= 1) continue;
      tmp.resize(n);
      for (int64_t i = 0; i < n; i++)
        tmp[i] = ((uint64_t)keys_low[lo + i] << 32) | positions[lo + i];
      std::sort(tmp.begin(), tmp.end());
      for (int64_t i = 0; i < n; i++) {
        keys_low[lo + i] = (uint16_t)(tmp[i] >> 32);
        positions[lo + i] = (uint32_t)tmp[i];
      }
    }
  };
  {
    std::vector<std::thread> ths;
    for (int32_t t = 0; t < T; t++) ths.emplace_back(phase_c, t);
    for (auto& th : ths) th.join();
  }
  return acc;
}

}  // extern "C"
