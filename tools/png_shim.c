/* External-oracle shim around the system libpng (test-time compile):
 * decodes PNG streams through the simplified API so tests can prove
 * any conformant reader accepts the in-repo encoder's files.  Used by
 * tests/test_png_oracle.py; never part of the production engine. */
#include <stdlib.h>
#include <string.h>
#include <png.h>

int pshim_decode(const unsigned char *buf, size_t len,
                 unsigned char *out, size_t maxout,
                 int *w, int *h, int *ncomp)
{
    png_image image;
    memset(&image, 0, sizeof image);
    image.version = PNG_IMAGE_VERSION;
    if (!png_image_begin_read_from_memory(&image, buf, len))
        return -1;
    int gray = (image.format & PNG_FORMAT_FLAG_COLOR) == 0;
    image.format = gray ? PNG_FORMAT_GRAY : PNG_FORMAT_RGB;
    *w = image.width;
    *h = image.height;
    *ncomp = gray ? 1 : 3;
    size_t need = PNG_IMAGE_SIZE(image);
    if (need > maxout) {
        png_image_free(&image);
        return -2;
    }
    if (!png_image_finish_read(&image, NULL, out, 0, NULL))
        return -3;
    return 0;
}
