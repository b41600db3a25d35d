/* Golden-fixture harness for arithmetic-coded JPEG (T.81 Annex D/F).
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

static int do_encode(int w, int h, int rgb, int ri, int prog) {
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
  cinfo.arith_code = TRUE;          /* the point of the exercise */
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

int main(int argc, char **argv) {
  if (argc >= 4 && (!strcmp(argv[1], "encode") ||
                    !strcmp(argv[1], "encode_prog")))
    return do_encode(atoi(argv[2]), atoi(argv[3]),
                     argc > 4 && !strcmp(argv[4], "RGB"),
                     argc > 5 ? atoi(argv[5]) : 0,
                     !strcmp(argv[1], "encode_prog"));
  if (argc >= 2 && !strcmp(argv[1], "coefs"))
    return do_coefs();
  die("usage: encode|encode_prog W H GRAY|RGB [ri] | coefs");
  return 2;
}
