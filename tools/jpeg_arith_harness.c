/* Golden-fixture harness for arithmetic-coded JPEG (T.81 Annex D/F)
 * plus (r12) Huffman-layer conformance modes:
 *   encode_huff / encode_huff_prog  W H GRAY|RGB [ri]
 *       baseline (Annex K tables) / progressive HUFFMAN encodes
 *   decode                          < JPEG > raw decoded samples
 *       libjpeg's decoded pixels — the tolerance-based contract for
 *       tools/jpeg_conformance.py (IDCTs legally differ by a count
 *       or two; an entropy desync differs catastrophically).
 *
 * Drives the system libjpeg (the reference implementation of the
 * public spec) to produce ground truth for the from-scratch QM-coder
 * in dolphinbeat_spark/operators/jpeg.py:
 *
 *   encode W H GRAY|RGB [restart_interval]  < raw pixels > arith JPEG
 *   encode_prog W H GRAY|RGB [restart_interval]
 *       same, progressive (SOF10, jpeg_simple_progression scan script)
 *   coefs                                   < JPEG > per-block coefficients
 *
 * "coefs" dumps the ENTROPY layer exactly (jpeg_read_coefficients):
 * quantized DCT integers are decoder-independent, unlike IDCT pixel
 * output, so they pin the arithmetic decode bit-for-bit.
 * Output format: for each component: int32 LE {comp_index, height_in_
 * blocks, width_in_blocks}, then h*w blocks of 64 int16 LE in natural
 * order.  Build: gcc -O2 -o jpeg_arith_harness jpeg_arith_harness.c -ljpeg
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>

static void die(const char *msg) { fprintf(stderr, "%s\n", msg); exit(2); }

static unsigned char *read_all(FILE *f, unsigned long *n) {
  unsigned char *buf = NULL;
  unsigned long cap = 0, len = 0;
  size_t got;
  do {
    if (len + 65536 > cap) { cap = cap ? cap * 2 : 131072; buf = realloc(buf, cap); }
    got = fread(buf + len, 1, 65536, f);
    len += got;
  } while (got > 0);
  *n = len;
  return buf;
}

static int do_encode(int w, int h, int rgb, int ri, int prog,
                     int huff) {
  struct jpeg_compress_struct cinfo;
  struct jpeg_error_mgr jerr;
  unsigned long inlen, outlen = 0;
  unsigned char *pixels, *out = NULL;
  int stride = w * (rgb ? 3 : 1);
  JSAMPROW row;
  int y;

  pixels = read_all(stdin, &inlen);
  if ((long)inlen < (long)stride * h) die("short pixel input");

  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_compress(&cinfo);
  jpeg_mem_dest(&cinfo, &out, &outlen);
  cinfo.image_width = w;
  cinfo.image_height = h;
  cinfo.input_components = rgb ? 3 : 1;
  cinfo.in_color_space = rgb ? JCS_RGB : JCS_GRAYSCALE;
  jpeg_set_defaults(&cinfo);
  cinfo.arith_code = huff ? FALSE : TRUE;
  if (huff && rgb) {
    /* conformance contract is pre-upsampling: force 4:4:4 so the
     * pixel compare is not dominated by the decoder's documented
     * simple-vs-fancy chroma upsampling policy */
    int ci;
    for (ci = 0; ci < cinfo.num_components; ci++) {
      cinfo.comp_info[ci].h_samp_factor = 1;
      cinfo.comp_info[ci].v_samp_factor = 1;
    }
  }
  cinfo.optimize_coding = FALSE;
  cinfo.restart_interval = ri;
  if (prog)                         /* SOF10: libjpeg's standard script */
    jpeg_simple_progression(&cinfo);
  jpeg_start_compress(&cinfo, TRUE);
  for (y = 0; y < h; y++) {
    row = pixels + (long)y * stride;
    jpeg_write_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_compress(&cinfo);
  fwrite(out, 1, outlen, stdout);
  jpeg_destroy_compress(&cinfo);
  return 0;
}

static int do_coefs(void) {
  struct jpeg_decompress_struct cinfo;
  struct jpeg_error_mgr jerr;
  unsigned long inlen;
  unsigned char *data = read_all(stdin, &inlen);
  jvirt_barray_ptr *coefs;
  int ci;

  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, inlen);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) die("bad header");
  coefs = jpeg_read_coefficients(&cinfo);
  if (!coefs) die("no coefficients");
  for (ci = 0; ci < cinfo.num_components; ci++) {
    jpeg_component_info *comp = cinfo.comp_info + ci;
    int hb = comp->height_in_blocks, wb = comp->width_in_blocks;
    int hdr[3]; int by, bx, k;
    hdr[0] = ci; hdr[1] = hb; hdr[2] = wb;
    fwrite(hdr, 4, 3, stdout);
    for (by = 0; by < hb; by++) {
      JBLOCKARRAY rows = (*cinfo.mem->access_virt_barray)(
          (j_common_ptr)&cinfo, coefs[ci], by, 1, FALSE);
      for (bx = 0; bx < wb; bx++) {
        short blk[64];
        for (k = 0; k < 64; k++) blk[k] = rows[0][bx][k];
        fwrite(blk, 2, 64, stdout);
      }
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

static int do_decode(void) {
  struct jpeg_decompress_struct cinfo;
  struct jpeg_error_mgr jerr;
  unsigned long inlen;
  unsigned char *data = read_all(stdin, &inlen);
  JSAMPROW row;
  unsigned char *buf;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, inlen);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) die("bad header");
  jpeg_start_decompress(&cinfo);
  buf = malloc((size_t)cinfo.output_width * cinfo.output_components);
  while (cinfo.output_scanline < cinfo.output_height) {
    row = buf;
    jpeg_read_scanlines(&cinfo, &row, 1);
    fwrite(buf, 1,
           (size_t)cinfo.output_width * cinfo.output_components, stdout);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

int main(int argc, char **argv) {
  if (argc >= 4 && (!strncmp(argv[1], "encode", 6)))
    return do_encode(atoi(argv[2]), atoi(argv[3]),
                     argc > 4 && !strcmp(argv[4], "RGB"),
                     argc > 5 ? atoi(argv[5]) : 0,
                     strstr(argv[1], "_prog") != NULL,
                     strstr(argv[1], "huff") != NULL);
  if (argc >= 2 && !strcmp(argv[1], "coefs"))
    return do_coefs();
  if (argc >= 2 && !strcmp(argv[1], "decode"))
    return do_decode();
  die("usage: encode|encode_prog|encode_huff|encode_huff_prog "
      "W H GRAY|RGB [ri] | coefs | decode");
  return 2;
}
