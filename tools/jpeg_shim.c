/* External-oracle shim around the system libjpeg (test-time compile,
 * the same device as tests/test_pmtiles.py compiling the reference's
 * pmtiles.hpp): decodes any JFIF stream (baseline or progressive) and
 * encodes progressive via jpeg_simple_progression — the real-world
 * generator of SOF2 streams with EOB runs, successive approximation
 * and per-scan optimized tables.  Used by tests/test_jpeg_oracle.py;
 * never part of the production engine. */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <setjmp.h>
#include <jpeglib.h>

typedef struct {
    struct jpeg_error_mgr pub;
    jmp_buf setjmp_buffer;
} shim_err;

static void shim_error_exit(j_common_ptr cinfo)
{
    shim_err *e = (shim_err *)cinfo->err;
    longjmp(e->setjmp_buffer, 1);
}

int jshim_decode(const unsigned char *buf, unsigned long len,
                 unsigned char *out, long maxout,
                 int *w, int *h, int *ncomp)
{
    struct jpeg_decompress_struct cinfo;
    shim_err jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = shim_error_exit;
    if (setjmp(jerr.setjmp_buffer)) {
        jpeg_destroy_decompress(&cinfo);
        return -1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, (unsigned char *)buf, len);
    jpeg_read_header(&cinfo, TRUE);
    jpeg_start_decompress(&cinfo);
    *w = cinfo.output_width;
    *h = cinfo.output_height;
    *ncomp = cinfo.output_components;
    long stride = (long)cinfo.output_width * cinfo.output_components;
    if ((long)cinfo.output_height * stride > maxout) {
        jpeg_destroy_decompress(&cinfo);
        return -2;
    }
    while (cinfo.output_scanline < cinfo.output_height) {
        unsigned char *rowp = out + (long)cinfo.output_scanline * stride;
        jpeg_read_scanlines(&cinfo, &rowp, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 0;
}

int jshim_encode(const unsigned char *pix, int w, int h, int ncomp,
                 int quality, int progressive,
                 unsigned char **outbuf, unsigned long *outlen)
{
    struct jpeg_compress_struct cinfo;
    shim_err jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = shim_error_exit;
    if (setjmp(jerr.setjmp_buffer)) {
        jpeg_destroy_compress(&cinfo);
        return -1;
    }
    jpeg_create_compress(&cinfo);
    *outbuf = NULL;
    *outlen = 0;
    jpeg_mem_dest(&cinfo, outbuf, outlen);
    cinfo.image_width = w;
    cinfo.image_height = h;
    cinfo.input_components = ncomp;
    cinfo.in_color_space = ncomp == 4   ? JCS_CMYK
                           : ncomp == 3 ? JCS_RGB
                                        : JCS_GRAYSCALE;
    jpeg_set_defaults(&cinfo);
    /* progressive==2: 4-comp input written as YCCK (Adobe APP14
     * transform 2) — the wild Photoshop-CMYK variant */
    if (ncomp == 4 && progressive == 2) {
        jpeg_set_colorspace(&cinfo, JCS_YCCK);
        progressive = 0;
    }
    jpeg_set_quality(&cinfo, quality, TRUE);
    if (progressive)
        jpeg_simple_progression(&cinfo);
    jpeg_start_compress(&cinfo, TRUE);
    while (cinfo.next_scanline < cinfo.image_height) {
        JSAMPROW rowp =
            (JSAMPROW)(pix + (long)cinfo.next_scanline * w * ncomp);
        jpeg_write_scanlines(&cinfo, &rowp, 1);
    }
    jpeg_finish_compress(&cinfo);
    jpeg_destroy_compress(&cinfo);
    return 0;
}

void jshim_free(void *p)
{
    free(p);
}
