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

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

struct Block {
  size_t comp_off;   // offset of deflate payload within file buffer
  size_t comp_len;   // payload length (without header/footer)
  size_t out_off;    // offset in the decompressed stream
  size_t out_len;    // ISIZE
};

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

bool inflate_block(const uint8_t* src, size_t src_len, uint8_t* dst,
                   size_t dst_len) {
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

const char kNt16[17] = "=ACMGRSVTWYHKDBN";

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
  char error[256];
};

void seeksv_bam_free(BamSoA* b) {
  if (!b) return;
  free(b->flag); free(b->tid); free(b->pos); free(b->mapq); free(b->mtid);
  free(b->mpos); free(b->isize); free(b->l_qseq); free(b->xc);
  free(b->cig_off); free(b->cig); free(b->seq_off); free(b->seq);
  free(b->qual); free(b->qname_off); free(b->qnames); free(b->ref_lens);
  free(b->ref_names);
  free(b);
}

static BamSoA* fail(BamSoA* b, const char* msg) {
  snprintf(b->error, sizeof(b->error), "%s", msg);
  return b;
}

BamSoA* seeksv_bam_decode(const char* path, int n_threads) {
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
        for (size_t i = lo; i < hi; i++) {
          const Block& blk = blocks[i];
          inflate_block(comp.data() + blk.comp_off, blk.comp_len,
                        data.data() + blk.out_off, blk.out_len);
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

  // pass 1: count records and payload sizes
  const uint8_t* rec = p;
  int64_t n = 0, cig_total = 0, seq_total = 0, qname_total = 0;
  std::vector<const uint8_t*> rec_ptrs;
  while (rec + 4 <= end) {
    int32_t bs;
    memcpy(&bs, rec, 4);
    if (rec + 4 + bs > end) break;
    rec_ptrs.push_back(rec);
    uint8_t l_read_name = rec[4 + 8];
    uint16_t n_cigar;
    memcpy(&n_cigar, rec + 4 + 12, 2);
    int32_t l_seq;
    memcpy(&l_seq, rec + 4 + 16, 4);
    n++;
    cig_total += n_cigar;
    seq_total += l_seq;
    qname_total += l_read_name - 1;
    rec = rec + 4 + bs;
  }
  out->n = n;
  out->flag = (int32_t*)malloc(4 * n);
  out->tid = (int32_t*)malloc(4 * n);
  out->pos = (int32_t*)malloc(4 * n);
  out->mapq = (int32_t*)malloc(4 * n);
  out->mtid = (int32_t*)malloc(4 * n);
  out->mpos = (int32_t*)malloc(4 * n);
  out->isize = (int32_t*)malloc(4 * n);
  out->l_qseq = (int32_t*)malloc(4 * n);
  out->xc = (int32_t*)malloc(4 * n);
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

  // offsets (sequential prefix pass)
  {
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

  // pass 2: parallel fill
  {
    std::vector<std::thread> ths;
    int nt = n_threads;
    int64_t per = (n + nt - 1) / nt;
    for (int t = 0; t < nt; t++) {
      int64_t lo = t * per, hi = lo + per < n ? lo + per : n;
      if (lo >= hi) break;
      ths.emplace_back([&, lo, hi]() {
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
          memcpy(out->qnames + out->qname_off[i], body, l_read_name - 1);
          body += l_read_name;
          memcpy(out->cig + out->cig_off[i], body, 4 * (size_t)n_cigar);
          body += 4 * (size_t)n_cigar;
          uint8_t* sdst = out->seq + out->seq_off[i];
          for (int32_t k = 0; k < l_seq; k++) {
            uint8_t byte = body[k >> 1];
            uint8_t nib = (k & 1) ? (byte & 0xF) : (byte >> 4);
            sdst[k] = (uint8_t)kNt16[nib];
          }
          body += (l_seq + 1) / 2;
          memcpy(out->qual + out->seq_off[i], body, (size_t)l_seq);
          body += l_seq;
          out->xc[i] = (body < rend) ? aux_xc(body, rend) : 0;
        }
      });
    }
    for (auto& th : ths) th.join();
  }
  return out;
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

}  // extern "C"
