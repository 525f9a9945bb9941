#!/bin/bash
# Build the reference gnuais binary (read-only at /root/reference) as the
# parity oracle, into the gitignored .oracle/ directory.  A stub ALSA
# header satisfies the soundcard code paths we never exercise (tests use
# file-input mode only, ais.c:173-186).
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
REF="${REFERENCE_DIR:-/root/reference}"
OUT="$REPO/.oracle"
mkdir -p "$OUT/alsa" "$OUT/build" "$OUT/run"

cat > "$OUT/alsa/asoundlib.h" <<'EOF'
/* Minimal ALSA stub so the reference oracle binary links without
 * libasound.  Only file-input mode (-l) is exercised; these stubs
 * return errors if the soundcard path is ever taken. */
#ifndef STUB_ASOUNDLIB_H
#define STUB_ASOUNDLIB_H
#include <stddef.h>
#include <errno.h>
#include <string.h>
#include <stdlib.h>
#include <stdio.h>
typedef struct _snd_pcm snd_pcm_t;
typedef struct _snd_pcm_hw_params snd_pcm_hw_params_t;
typedef unsigned long snd_pcm_uframes_t;
typedef int snd_pcm_stream_t;
typedef int snd_pcm_access_t;
typedef int snd_pcm_format_t;
#define SND_PCM_STREAM_CAPTURE 1
#define SND_PCM_ACCESS_RW_INTERLEAVED 3
#define SND_PCM_FORMAT_S16_LE 2
#define snd_pcm_hw_params_alloca(p) (*(p) = (snd_pcm_hw_params_t *)0)
static inline int snd_pcm_open(snd_pcm_t **h, const char *n, snd_pcm_stream_t s, int m) { (void)h;(void)n;(void)s;(void)m; return -1; }
static inline const char *snd_strerror(int e) { (void)e; return "alsa-stub"; }
static inline int snd_pcm_hw_params_any(snd_pcm_t *h, snd_pcm_hw_params_t *p) { (void)h;(void)p; return -1; }
static inline int snd_pcm_hw_params_set_access(snd_pcm_t *h, snd_pcm_hw_params_t *p, snd_pcm_access_t a) { return -1; }
static inline int snd_pcm_hw_params_set_format(snd_pcm_t *h, snd_pcm_hw_params_t *p, snd_pcm_format_t f) { return -1; }
static inline int snd_pcm_hw_params_set_channels(snd_pcm_t *h, snd_pcm_hw_params_t *p, unsigned c) { return -1; }
static inline int snd_pcm_hw_params_set_rate_near(snd_pcm_t *h, snd_pcm_hw_params_t *p, unsigned *r, int *d) { return -1; }
static inline int snd_pcm_hw_params_set_period_size_near(snd_pcm_t *h, snd_pcm_hw_params_t *p, snd_pcm_uframes_t *s, int *d) { return -1; }
static inline int snd_pcm_hw_params(snd_pcm_t *h, snd_pcm_hw_params_t *p) { return -1; }
static inline int snd_pcm_hw_params_get_period_size(const snd_pcm_hw_params_t *p, snd_pcm_uframes_t *s, int *d) { return -1; }
static inline long snd_pcm_readi(snd_pcm_t *h, void *b, snd_pcm_uframes_t n) { return -1; }
static inline int snd_pcm_prepare(snd_pcm_t *h) { return -1; }
static inline int snd_pcm_close(snd_pcm_t *h) { return 0; }
#endif
EOF

cat > "$OUT/build/config.h" <<'EOF'
#define HAVE_ALSA 1
/* no MYSQL / CURL / PULSEAUDIO / GTK in the oracle build */
#define PACKAGE "gnuais"
#define VERSION "0.3.3"
EOF

SRCS=(ais cfg crc32 hlog input out_mysql receiver splay cache range cfgfile
      filter hmalloc out_json protodec rwlock serial spsymbol ipc)
FILES=()
for s in "${SRCS[@]}"; do FILES+=("$REF/src/$s.c"); done

gcc -O2 -w -fcommon -I"$OUT" -I"$OUT/build" -I"$REF/src" \
    -o "$OUT/build/gnuais_oracle" "${FILES[@]}" -lpthread -lm

# numeric-parity harness around the reference range math
cat > "$OUT/build/range_harness.c" <<'EOF'
/* Oracle harness for the reference range math (range.c), for numeric
 * parity testing of the rebuild's RangeTracker. */
#include <stdio.h>
#include <stdlib.h>
#include "range.h"
#include "protodec.h"
float mylat, mylng;
int have_my_loc = 1;
int hlog(int priority, const char *fmt, ...) { return 0; }
int main(int argc, char **argv)
{
    struct demod_state_t d = {0};
    d.chanid = 'A';
    mylat = lat2rad(atof(argv[1]));
    mylng = lon2rad(atof(argv[2]));
    for (int i = 3; i + 1 < argc; i += 2)
        update_range(&d, atof(argv[i]), atof(argv[i + 1]));
    printf("%.6f\n", d.best_range);
    return 0;
}
EOF
gcc -O2 -w -I"$OUT" -I"$OUT/build" -I"$REF/src" \
    -o "$OUT/build/range_harness" "$OUT/build/range_harness.c" \
    "$REF/src/range.c" -lm

# ---------------------------------------------------------------------
# Uplink harness: the REAL out_json.c + cache.c + the system's real
# libcurl, so the JSON-AIS blob AND the multipart POST the reference
# performs can be byte-captured by a test HTTP server.  The libcurl
# runtime (.so.4) exists here but the development headers do not, so a
# minimal ABI-matching declaration header stands in (constants are the
# stable public values from curl/curl.h).  jsonout_export is static in
# out_json.c, hence the #include-the-.c harness TU.
mkdir -p "$OUT/curl"
cat > "$OUT/curl/curl.h" <<'EOF'
#ifndef STUB_CURL_CURL_H
#define STUB_CURL_CURL_H
#include <stddef.h>
typedef void CURL;
typedef int CURLcode;
#define CURLE_OK 0
typedef enum {
  CURLOPT_URL = 10002,
  CURLOPT_VERBOSE = 41,
  CURLOPT_NOPROGRESS = 43,
  CURLOPT_WRITEFUNCTION = 20011,
  CURLOPT_HTTPHEADER = 10023,
  CURLOPT_HTTPPOST = 10024
} CURLoption;
typedef enum { CURLINFO_RESPONSE_CODE = 0x200002 } CURLINFO;
typedef enum {
  CURLFORM_NOTHING = 0,
  CURLFORM_COPYNAME = 1,
  CURLFORM_PTRCONTENTS = 5,
  CURLFORM_CONTENTTYPE = 14,
  CURLFORM_END = 17
} CURLformoption;
typedef int CURLFORMcode;
struct curl_httppost;
struct curl_slist;
#define CURL_GLOBAL_SSL (1<<0)
#define CURL_GLOBAL_WIN32 (1<<1)
#define CURL_GLOBAL_ALL (CURL_GLOBAL_SSL|CURL_GLOBAL_WIN32)
CURLcode curl_global_init(long flags);
void curl_global_cleanup(void);
CURL *curl_easy_init(void);
CURLcode curl_easy_setopt(CURL *handle, CURLoption option, ...);
CURLcode curl_easy_perform(CURL *handle);
CURLcode curl_easy_getinfo(CURL *handle, CURLINFO info, ...);
void curl_easy_cleanup(CURL *handle);
const char *curl_easy_strerror(CURLcode);
struct curl_slist *curl_slist_append(struct curl_slist *, const char *);
void curl_slist_free_all(struct curl_slist *);
CURLFORMcode curl_formadd(struct curl_httppost **httppost,
                          struct curl_httppost **last_post, ...);
void curl_formfree(struct curl_httppost *form);
#endif
EOF

cat > "$OUT/build/uplink_harness.c" <<'EOF'
/* Oracle harness around the reference JSON-AIS exporter: feeds the
 * REAL cache.c setters from tab-separated stdin commands, then runs
 * ONE jsonout_export() through the real libcurl POST path.
 *   uplink_harness <url> [mycall] < commands.tsv
 * Commands (tab-separated):
 *   pos t mmsi navstat lat lon hdg course rot sog
 *   data t mmsi imo callsign name dest shiptype A B C D draught
 *   datab t mmsi callsign shiptype A B C D
 *   databb t mmsi shiptype A B C D
 *   name t mmsi name dest
 *   persons t mmsi n
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "cfg.h"

char *mycall;
struct uplink_config_t *uplink_config;

#include "out_json.c"

int main(int argc, char **argv)
{
    static struct uplink_config_t up;
    char line[4096];

    if (argc < 2) { fprintf(stderr, "usage: uplink_harness <url>\n"); return 2; }
    mycall = (argc > 2) ? argv[2] : "TESTCALL";
    up.proto = UPLINK_JSON;
    up.name = "test";
    up.url = argv[1];
    up.next = NULL;
    uplink_config = &up;

    cache_init();
    curl_global_init(CURL_GLOBAL_ALL);

    while (fgets(line, sizeof line, stdin)) {
        char *f[16];
        int n = 0;
        char *p = line;
        char *nl = strchr(line, '\n');
        if (nl) *nl = 0;
        /* strsep keeps EMPTY fields (a trailing empty destination must
         * reach cache_vesselname as "", not vanish like strtok would) */
        char *tok;
        while ((tok = strsep(&p, "\t")) != NULL && n < 16)
            f[n++] = tok;
        if (!n || !f[0][0]) continue;
        if (!strcmp(f[0], "pos") && n >= 10)
            cache_position(atoi(f[1]), atoi(f[2]), atoi(f[3]), atof(f[4]),
                           atof(f[5]), atoi(f[6]), atof(f[7]), atoi(f[8]),
                           atof(f[9]));
        else if (!strcmp(f[0], "data") && n >= 13)
            cache_vesseldata(atoi(f[1]), atoi(f[2]), atoi(f[3]), f[4], f[5],
                             f[6], atoi(f[7]), atoi(f[8]), atoi(f[9]),
                             atoi(f[10]), atoi(f[11]), atof(f[12]));
        else if (!strcmp(f[0], "datab") && n >= 9)
            cache_vesseldatab(atoi(f[1]), atoi(f[2]), f[3], atoi(f[4]),
                              atoi(f[5]), atoi(f[6]), atoi(f[7]), atoi(f[8]));
        else if (!strcmp(f[0], "databb") && n >= 8)
            cache_vesseldatabb(atoi(f[1]), atoi(f[2]), atoi(f[3]), atoi(f[4]),
                               atoi(f[5]), atoi(f[6]), atoi(f[7]));
        else if (!strcmp(f[0], "name") && n >= 5)
            cache_vesselname(atoi(f[1]), atoi(f[2]), f[3], f[4]);
        else if (!strcmp(f[0], "persons") && n >= 4)
            cache_vessel_persons(atoi(f[1]), atoi(f[2]), atoi(f[3]));
        else { fprintf(stderr, "bad command: %s\n", f[0]); return 2; }
    }

    jsonout_export();
    curl_global_cleanup();
    return 0;
}
EOF
# awk reads all of ldconfig's output (an early exit would SIGPIPE it
# under pipefail)
CURL_RUNTIME="$(ldconfig -p 2>/dev/null | awk '/libcurl\.so/{if (!v) v=$NF} END{print v}')"
if [ -n "$CURL_RUNTIME" ]; then
    gcc -O2 -w -fcommon -DHAVE_CURL=1 -I"$OUT" -I"$OUT/build" -I"$REF/src" \
        -o "$OUT/build/uplink_harness" "$OUT/build/uplink_harness.c" \
        "$REF/src/cache.c" "$REF/src/splay.c" "$REF/src/spsymbol.c" \
        "$REF/src/crc32.c" "$REF/src/hmalloc.c" "$REF/src/hlog.c" \
        "$REF/src/rwlock.c" "$CURL_RUNTIME" -lpthread -lm
    echo "uplink harness built against $CURL_RUNTIME"
else
    echo "libcurl runtime not found; uplink harness skipped"
fi

echo "oracle built: $OUT/build/gnuais_oracle (+range_harness)"
