"""Build/locate the reference-engine oracle binary (test-only helper).

Compiles the reference's core C sources from /root/reference (read-only;
copied to /tmp) with a fake autoconf header and a minimal glib ABI shim,
plus a tiny create/update/fetch CLI. Used to generate goldens and for
differential property tests. Best-effort: callers skip when unavailable.
"""

from __future__ import annotations

import os
import shutil
import subprocess

BIN = "/tmp/rrdmini"
SRC = "/tmp/rrdref"

_CONFIG_H = """
#ifndef RRD_CONFIG_H
#define RRD_CONFIG_H
#define HAVE_FEATURES_H 1
#define HAVE_SYS_MMAN_H 1
#define HAVE_SYS_TYPES_H 1
#define HAVE_SYS_PARAM_H 1
#define HAVE_SYS_STAT_H 1
#define HAVE_UNISTD_H 1
#define HAVE_STDINT_H 1
#define HAVE_INTTYPES_H 1
#define HAVE_STRINGS_H 1
#define HAVE_CTYPE_H 1
#define HAVE_ERRNO_H 1
#define HAVE_FCNTL_H 1
#define HAVE_LIBGEN_H 1
#define HAVE_LOCALE_H 1
#define HAVE_MATH_H 1
#define HAVE_SIGNAL_H 1
#define HAVE_STDARG_H 1
#define HAVE_STDIO_H 1
#define HAVE_SYS_TIMES_H 1
#define HAVE_SYS_TIME_H 1
#define HAVE_TIME_H 1
#define HAVE_MMAP 1
#define HAVE_MADVISE 1
#define HAVE_POSIX_FADVISE 1
#define HAVE_STRERROR_R 1
#define HAVE_SNPRINTF 1
#define HAVE_VSNPRINTF 1
#define HAVE_STRFTIME 1
#define HAVE_MKTIME 1
#define HAVE_GETTIMEOFDAY 1
#define HAVE_TZSET 1
#define HAVE_TIMEZONE 1
#define HAVE_STRUCT_TM_TM_GMTOFF 1
#define HAVE_FLOCK 1
#define HAVE_FDATASYNC 1
#define HAVE_FSYNC 1
#define HAVE_CHOWN 1
#define HAVE_GETUID 1
#define HAVE_ISNAN 1
#define HAVE_ISINF 1
#define HAVE_STRTOLL 1
#define HAVE_MEMMOVE 1
#define HAVE_STRCHR 1
#define HAVE_STRDUP 1
#define HAVE_STRNDUP 1
#define HAVE_STRERROR 1
#define HAVE_OPENDIR 1
#define HAVE_READDIR 1
#define HAVE_DIRENT_H 1
#define HAVE_CLOCK_GETTIME 1
#define SIZEOF_TIME_T 8
#define SIZEOF_LONG 8
#define RRD_DEFAULT_LOCKING LOCK_BLOCK
#define NUMVERS 1.9000
#define PACKAGE_VERSION "1.9.0"
#define PACKAGE_NAME "rrdtool"
#define PACKAGE_STRING "rrdtool 1.9.0"
#define _GNU_SOURCE 1
#define HAVE_G_REGEX_NEW 1
#define HAVE_LONG_DOUBLE 1
#include <float.h>
#include "rrd_config_bottom.h"
#endif
"""

_GLIB_SHIM = """
#ifndef MINI_GLIB_H
#define MINI_GLIB_H
#include <stddef.h>
typedef void* gpointer;
typedef const void* gconstpointer;
typedef char gchar;
typedef int gint;
typedef unsigned int guint;
typedef int gboolean;
typedef unsigned int GQuark;
typedef struct _GList GList;
struct _GList { gpointer data; GList *next; GList *prev; };
typedef struct _GError { GQuark domain; gint code; gchar *message; } GError;
typedef struct _GRegex GRegex;
typedef struct _GMatchInfo GMatchInfo;
typedef struct _GTree GTree;
typedef gint (*GCompareFunc)(gconstpointer, gconstpointer);
typedef gint (*GCompareDataFunc)(gconstpointer, gconstpointer, gpointer);
typedef void (*GDestroyNotify)(gpointer);
typedef enum { G_REGEX_CASELESS = 1<<0, G_REGEX_MULTILINE = 1<<1,
               G_REGEX_DOTALL = 1<<2, G_REGEX_EXTENDED = 1<<3 } GRegexCompileFlags;
typedef enum { G_REGEX_MATCH_ANCHORED = 1<<4 } GRegexMatchFlags;
GList *g_list_append(GList *list, gpointer data);
void g_list_free_full(GList *list, GDestroyNotify free_func);
guint g_list_length(GList *list);
#define g_list_next(list) ((list) ? ((GList*)(list))->next : NULL)
GRegex *g_regex_new(const gchar *pattern, GRegexCompileFlags compile_options,
                    GRegexMatchFlags match_options, GError **error);
gboolean g_regex_match(const GRegex *regex, const gchar *string,
                       GRegexMatchFlags match_options, GMatchInfo **match_info);
gint g_regex_get_capture_count(const GRegex *regex);
void g_regex_unref(GRegex *regex);
gboolean g_match_info_fetch_pos(const GMatchInfo *match_info, gint match_num,
                                gint *start_pos, gint *end_pos);
void g_match_info_free(GMatchInfo *match_info);
GTree *g_tree_new_full(GCompareDataFunc key_compare_func, gpointer key_compare_data,
                       GDestroyNotify key_destroy_func, GDestroyNotify value_destroy_func);
void g_tree_insert(GTree *tree, gpointer key, gpointer value);
gpointer g_tree_lookup(GTree *tree, gconstpointer key);
void g_tree_destroy(GTree *tree);
void g_free(gpointer mem);
void g_error_free(GError *error);
#define GLIB_CHECK_VERSION(a,b,c) 1
#endif
"""

_MINI_C = r"""
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "rrd.h"

int main(int argc, char **argv) {
    if (argc < 2) { fprintf(stderr, "usage: mini create|update|fetch ...\n"); return 1; }
    optind = 0; opterr = 0;
    if (!strcmp(argv[1], "create")) {
        if (rrd_create(argc - 1, (const char **)(argv + 1))) {
            fprintf(stderr, "ERR %s\n", rrd_get_error()); return 1; }
    } else if (!strcmp(argv[1], "update")) {
        if (rrd_update(argc - 1, (const char **)(argv + 1))) {
            fprintf(stderr, "ERR %s\n", rrd_get_error()); return 1; }
    } else if (!strcmp(argv[1], "fetch")) {
        time_t start, end; unsigned long step, ds_cnt, i, ii;
        char **ds_namv; rrd_value_t *data;
        if (rrd_fetch(argc - 1, (const char **)(argv + 1), &start, &end, &step,
                      &ds_cnt, &ds_namv, &data)) {
            fprintf(stderr, "ERR %s\n", rrd_get_error()); return 1; }
        printf("ts");
        for (i = 0; i < ds_cnt; i++) printf(" %s", ds_namv[i]);
        printf("\n");
        rrd_value_t *p = data;
        for (time_t ti = start + step; ti <= end; ti += step) {
            printf("%lld:", (long long) ti);
            for (ii = 0; ii < ds_cnt; ii++) printf(" %.10e", *(p++));
            printf("\n");
        }
    } else { fprintf(stderr, "unknown cmd\n"); return 1; }
    return 0;
}
"""

_SOURCES = (
    "rrd_create rrd_update rrd_fetch rrd_open rrd_utils rrd_nan_inf rrd_error "
    "rrd_format rrd_parsetime rrd_rpncalc rrd_hw rrd_hw_math rrd_hw_update "
    "rrd_diff rrd_strtod rrd_snprintf rrd_thread_safe hash_32 mutex quicksort "
    "optparse plbasename rrd_client rrd_modify rrd_info rrd_dump rrd_restore "
    "rrd_fetch_cb compat-cloexec"
).split()


def ensure_binary() -> str | None:
    """Return the oracle binary path, building it if needed; None if the
    toolchain is unavailable."""
    if os.path.exists(BIN):
        return BIN
    if shutil.which("gcc") is None or not os.path.isdir("/root/reference/src"):
        return None
    try:
        if not os.path.isdir(SRC):
            shutil.copytree("/root/reference", SRC)
        with open(f"{SRC}/src/rrd_config.h", "w") as f:
            f.write(_CONFIG_H)
        with open(f"{SRC}/src/glib.h", "w") as f:
            f.write(_GLIB_SHIM)
        with open(f"{SRC}/mini.c", "w") as f:
            f.write(_MINI_C)
        xml = subprocess.run(
            ["pkg-config", "--cflags", "--libs", "libxml-2.0"],
            capture_output=True, text=True, check=True,
        ).stdout.split()
        cmd = (
            ["gcc", "-O1", f"-I{SRC}/src", "-o", BIN, f"{SRC}/mini.c"]
            + [f"{SRC}/src/{s}.c" for s in _SOURCES]
            + ["-lm", "-lpthread", "/usr/lib/x86_64-linux-gnu/libglib-2.0.so.0"]
            + xml
        )
        subprocess.run(cmd, capture_output=True, check=True)
        return BIN
    except Exception:
        return None
