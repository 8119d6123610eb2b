/* Single-rank implementations for the shim in mpi.h.  Collectives are
 * memcpy; point-to-point self-messages match by tag at Wait/Test time. */
#include "mpi.h"
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>

struct mpistub_req {
    int is_send;
    void *buf;
    size_t bytes;
    int tag;
    int done;
};

#define MAXPEND 4096
static struct mpistub_req *pending[MAXPEND];
static int npending = 0;

static void die(const char *msg)
{
    fprintf(stderr, "mpi_stub fatal: %s\n", msg);
    abort();
}

int MPI_Init(int *argc, char ***argv) { (void)argc; (void)argv; return 0; }
int MPI_Init_thread(int *argc, char ***argv, int required, int *provided)
{ (void)argc; (void)argv; if (provided) *provided = required; return 0; }
int MPI_Finalize(void) { return 0; }
int MPI_Abort(MPI_Comm comm, int code) { (void)comm; exit(code ? code : 1); }
int MPI_Comm_rank(MPI_Comm comm, int *rank) { (void)comm; *rank = 0; return 0; }
int MPI_Comm_size(MPI_Comm comm, int *size) { (void)comm; *size = 1; return 0; }
int MPI_Comm_dup(MPI_Comm comm, MPI_Comm *out) { *out = comm; return 0; }
int MPI_Comm_free(MPI_Comm *comm) { (void)comm; return 0; }
int MPI_Comm_split(MPI_Comm comm, int color, int key, MPI_Comm *out)
{ (void)color; (void)key; *out = comm; return 0; }

double MPI_Wtime(void)
{
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return ts.tv_sec + 1e-9 * ts.tv_nsec;
}

int MPI_Barrier(MPI_Comm comm) { (void)comm; return 0; }
int MPI_Bcast(void *buf, int count, MPI_Datatype dt, int root, MPI_Comm comm)
{ (void)buf; (void)count; (void)dt; (void)root; (void)comm; return 0; }

int MPI_Allreduce(const void *send, void *recv, int count, MPI_Datatype dt,
                  MPI_Op op, MPI_Comm comm)
{
    (void)op; (void)comm;
    if (send != MPI_IN_PLACE && send != recv)
        memcpy(recv, send, (size_t)count * (size_t)dt);
    return 0;
}

int MPI_Reduce(const void *send, void *recv, int count, MPI_Datatype dt,
               MPI_Op op, int root, MPI_Comm comm)
{ (void)root; return MPI_Allreduce(send, recv, count, dt, op, comm); }

int MPI_Allgather(const void *send, int scount, MPI_Datatype sdt,
                  void *recv, int rcount, MPI_Datatype rdt, MPI_Comm comm)
{
    (void)rcount; (void)rdt; (void)comm;
    if (send != MPI_IN_PLACE && send != recv)
        memcpy(recv, send, (size_t)scount * (size_t)sdt);
    return 0;
}

int MPI_Allgatherv(const void *send, int scount, MPI_Datatype sdt,
                   void *recv, const int *rcounts, const int *displs,
                   MPI_Datatype rdt, MPI_Comm comm)
{
    (void)rcounts; (void)comm;
    char *dst = (char *)recv + (displs ? (size_t)displs[0] * (size_t)rdt : 0);
    if (send != MPI_IN_PLACE && send != (void *)dst)
        memcpy(dst, send, (size_t)scount * (size_t)sdt);
    return 0;
}

int MPI_Gather(const void *send, int scount, MPI_Datatype sdt,
               void *recv, int rcount, MPI_Datatype rdt, int root,
               MPI_Comm comm)
{ (void)root; return MPI_Allgather(send, scount, sdt, recv, rcount, rdt, comm); }

int MPI_Igather(const void *send, int scount, MPI_Datatype sdt,
                void *recv, int rcount, MPI_Datatype rdt, int root,
                MPI_Comm comm, MPI_Request *req)
{
    MPI_Gather(send, scount, sdt, recv, rcount, rdt, root, comm);
    *req = MPI_REQUEST_NULL;
    return 0;
}

int MPI_Scatter(const void *send, int scount, MPI_Datatype sdt,
                void *recv, int rcount, MPI_Datatype rdt, int root,
                MPI_Comm comm)
{ (void)root; return MPI_Allgather(send, scount, sdt, recv, rcount, rdt, comm); }

int MPI_Alltoall(const void *send, int scount, MPI_Datatype sdt,
                 void *recv, int rcount, MPI_Datatype rdt, MPI_Comm comm)
{ return MPI_Allgather(send, scount, sdt, recv, rcount, rdt, comm); }

int MPI_Alltoallv(const void *send, const int *scounts, const int *sdispls,
                  MPI_Datatype sdt, void *recv, const int *rcounts,
                  const int *rdispls, MPI_Datatype rdt, MPI_Comm comm)
{
    (void)rcounts; (void)comm;
    const char *src = (const char *)send
        + (sdispls ? (size_t)sdispls[0] * (size_t)sdt : 0);
    char *dst = (char *)recv
        + (rdispls ? (size_t)rdispls[0] * (size_t)rdt : 0);
    if ((const void *)send != MPI_IN_PLACE && src != dst)
        memcpy(dst, src, (size_t)scounts[0] * (size_t)sdt);
    return 0;
}

static MPI_Request add_req(int is_send, void *buf, size_t bytes, int tag)
{
    if (npending >= MAXPEND)
        die("too many pending requests");
    struct mpistub_req *r = calloc(1, sizeof(*r));
    r->is_send = is_send;
    r->buf = buf;
    r->bytes = bytes;
    r->tag = tag;
    pending[npending++] = r;
    return r;
}

static void try_match(void)
{
    for (int i = 0; i < npending; i++) {
        struct mpistub_req *a = pending[i];
        if (a->done || a->is_send)
            continue;
        for (int j = 0; j < npending; j++) {
            struct mpistub_req *b = pending[j];
            if (b->done || !b->is_send)
                continue;
            if (a->tag != b->tag && a->tag != MPI_ANY_TAG)
                continue;
            size_t n = a->bytes < b->bytes ? a->bytes : b->bytes;
            memcpy(a->buf, b->buf, n);
            a->done = b->done = 1;
            break;
        }
    }
}

static void drop_done(void)
{
    int k = 0;
    for (int i = 0; i < npending; i++) {
        if (pending[i]->done)
            free(pending[i]);
        else
            pending[k++] = pending[i];
    }
    npending = k;
}

int MPI_Isend(const void *buf, int count, MPI_Datatype dt, int dest,
              int tag, MPI_Comm comm, MPI_Request *req)
{
    (void)comm;
    if (dest != 0)
        die("Isend to nonzero rank on 1-rank stub");
    *req = add_req(1, (void *)buf, (size_t)count * (size_t)dt, tag);
    return 0;
}

int MPI_Irecv(void *buf, int count, MPI_Datatype dt, int src, int tag,
              MPI_Comm comm, MPI_Request *req)
{
    (void)comm;
    if (src != 0 && src != MPI_ANY_SOURCE)
        die("Irecv from nonzero rank on 1-rank stub");
    *req = add_req(0, buf, (size_t)count * (size_t)dt, tag);
    return 0;
}

int MPI_Send(const void *buf, int count, MPI_Datatype dt, int dest,
             int tag, MPI_Comm comm)
{
    MPI_Request r;
    MPI_Isend(buf, count, dt, dest, tag, comm, &r);
    return 0;
}

int MPI_Recv(void *buf, int count, MPI_Datatype dt, int src, int tag,
             MPI_Comm comm, MPI_Status *st)
{
    MPI_Request r;
    MPI_Irecv(buf, count, dt, src, tag, comm, &r);
    return MPI_Wait(&r, st);
}

int MPI_Sendrecv(const void *sbuf, int scount, MPI_Datatype sdt, int dest,
                 int stag, void *rbuf, int rcount, MPI_Datatype rdt,
                 int src, int rtag, MPI_Comm comm, MPI_Status *st)
{
    (void)dest; (void)stag; (void)src; (void)rtag; (void)comm;
    size_t sn = (size_t)scount * (size_t)sdt;
    size_t rn = (size_t)rcount * (size_t)rdt;
    size_t n = sn < rn ? sn : rn;
    if (sbuf != rbuf)
        memcpy(rbuf, sbuf, n);
    if (st) { st->MPI_SOURCE = 0; st->MPI_TAG = rtag; st->_bytes = n; }
    return 0;
}

int MPI_Test(MPI_Request *req, int *flag, MPI_Status *st)
{
    if (!req || *req == MPI_REQUEST_NULL) { if (flag) *flag = 1; return 0; }
    try_match();
    *flag = (*req)->done;
    if ((*req)->done) {
        if (st) { st->MPI_SOURCE = 0; st->MPI_TAG = (*req)->tag;
                  st->_bytes = (*req)->bytes; }
        drop_done();
        *req = MPI_REQUEST_NULL;
    }
    return 0;
}

int MPI_Wait(MPI_Request *req, MPI_Status *st)
{
    int flag = 0;
    MPI_Test(req, &flag, st);
    if (!flag)
        die("Wait on unmatched self-message");
    return 0;
}

int MPI_Waitall(int n, MPI_Request reqs[], MPI_Status sts[])
{
    for (int i = 0; i < n; i++)
        MPI_Wait(&reqs[i], sts ? &sts[i] : MPI_STATUS_IGNORE);
    return 0;
}

int MPI_Waitsome(int incount, MPI_Request reqs[], int *outcount,
                 int indices[], MPI_Status sts[])
{
    int k = 0;
    for (int i = 0; i < incount; i++) {
        if (reqs[i] == MPI_REQUEST_NULL)
            continue;
        MPI_Wait(&reqs[i], sts ? &sts[k] : MPI_STATUS_IGNORE);
        indices[k++] = i;
    }
    *outcount = k ? k : MPI_UNDEFINED;
    return 0;
}

int MPI_Type_contiguous(int count, MPI_Datatype old, MPI_Datatype *newt)
{ *newt = (MPI_Datatype)count * old; return 0; }
int MPI_Type_commit(MPI_Datatype *dt) { (void)dt; return 0; }
int MPI_Type_free(MPI_Datatype *dt) { (void)dt; return 0; }
int MPI_Type_get_extent(MPI_Datatype dt, MPI_Aint *lb, MPI_Aint *extent)
{ if (lb) *lb = 0; if (extent) *extent = (MPI_Aint)dt; return 0; }
int MPI_Type_size(MPI_Datatype dt, int *size) { *size = (int)dt; return 0; }
int MPI_Get_count(const MPI_Status *st, MPI_Datatype dt, int *count)
{ *count = st ? (int)(st->_bytes / (size_t)dt) : 0; return 0; }
int MPI_Get_processor_name(char *name, int *resultlen)
{ strcpy(name, "stub0"); *resultlen = 5; return 0; }
