/* Single-rank MPI shim: just enough of the MPI-2 surface to compile and
 * run MP-Gadget's tree-gravity path (forcetree.c / treewalk.c /
 * gravshort-tree.c and their util deps) as ONE rank for baseline
 * measurement.  All collectives degenerate to memcpy; point-to-point is
 * a tag-matched self-queue (never exercised with one topleaf, but
 * correct if hit).  This is NOT a general MPI implementation.
 */
#ifndef MPG_BASELINE_MPI_STUB_H
#define MPG_BASELINE_MPI_STUB_H

#include <stddef.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef int MPI_Comm;
#define MPI_COMM_WORLD ((MPI_Comm)91)
#define MPI_COMM_SELF  ((MPI_Comm)92)
#define MPI_COMM_NULL  ((MPI_Comm)0)

/* Datatype handle == its size in bytes (contiguous-only world). */
typedef long long MPI_Datatype;
#define MPI_DATATYPE_NULL ((MPI_Datatype)0)
#define MPI_BYTE   ((MPI_Datatype)1)
#define MPI_CHAR   ((MPI_Datatype)1)
#define MPI_UNSIGNED_CHAR ((MPI_Datatype)1)
#define MPI_SHORT  ((MPI_Datatype)2)
#define MPI_INT    ((MPI_Datatype)4)
#define MPI_UNSIGNED ((MPI_Datatype)4)
#define MPI_FLOAT  ((MPI_Datatype)4)
#define MPI_LONG   ((MPI_Datatype)8)
#define MPI_UNSIGNED_LONG ((MPI_Datatype)8)
#define MPI_LONG_LONG ((MPI_Datatype)8)
#define MPI_LONG_LONG_INT ((MPI_Datatype)8)
#define MPI_UNSIGNED_LONG_LONG ((MPI_Datatype)8)
#define MPI_DOUBLE ((MPI_Datatype)8)
#define MPI_LONG_DOUBLE ((MPI_Datatype)16)
#define MPI_INT8_T  ((MPI_Datatype)1)
#define MPI_UINT8_T ((MPI_Datatype)1)
#define MPI_INT32_T ((MPI_Datatype)4)
#define MPI_UINT32_T ((MPI_Datatype)4)
#define MPI_INT64_T ((MPI_Datatype)8)
#define MPI_UINT64_T ((MPI_Datatype)8)

typedef int MPI_Op;
#define MPI_OP_NULL 0
#define MPI_SUM 1
#define MPI_MAX 2
#define MPI_MIN 3
#define MPI_LOR 4
#define MPI_LAND 5
#define MPI_BOR 6
#define MPI_PROD 7

typedef struct MPI_Status {
    int MPI_SOURCE;
    int MPI_TAG;
    int MPI_ERROR;
    size_t _bytes;
} MPI_Status;
#define MPI_STATUS_IGNORE ((MPI_Status *)0)
#define MPI_STATUSES_IGNORE ((MPI_Status *)0)

typedef struct mpistub_req *MPI_Request;
#define MPI_REQUEST_NULL ((MPI_Request)0)

#define MPI_IN_PLACE ((void *)(-1))
#define MPI_UNDEFINED (-32766)
#define MPI_SUCCESS 0
#define MPI_ANY_SOURCE (-1)
#define MPI_ANY_TAG (-1)
#define MPI_MAX_PROCESSOR_NAME 128
typedef long long MPI_Aint;
typedef long long MPI_Offset;

int MPI_Init(int *argc, char ***argv);
int MPI_Init_thread(int *argc, char ***argv, int required, int *provided);
#define MPI_THREAD_SINGLE 0
#define MPI_THREAD_FUNNELED 1
#define MPI_THREAD_SERIALIZED 2
#define MPI_THREAD_MULTIPLE 3
int MPI_Finalize(void);
int MPI_Abort(MPI_Comm comm, int errorcode);
int MPI_Comm_rank(MPI_Comm comm, int *rank);
int MPI_Comm_size(MPI_Comm comm, int *size);
int MPI_Comm_dup(MPI_Comm comm, MPI_Comm *out);
int MPI_Comm_free(MPI_Comm *comm);
int MPI_Comm_split(MPI_Comm comm, int color, int key, MPI_Comm *out);
double MPI_Wtime(void);
int MPI_Barrier(MPI_Comm comm);
int MPI_Bcast(void *buf, int count, MPI_Datatype dt, int root, MPI_Comm comm);
int MPI_Allreduce(const void *send, void *recv, int count, MPI_Datatype dt,
                  MPI_Op op, MPI_Comm comm);
int MPI_Reduce(const void *send, void *recv, int count, MPI_Datatype dt,
               MPI_Op op, int root, MPI_Comm comm);
int MPI_Allgather(const void *send, int scount, MPI_Datatype sdt,
                  void *recv, int rcount, MPI_Datatype rdt, MPI_Comm comm);
int MPI_Allgatherv(const void *send, int scount, MPI_Datatype sdt,
                   void *recv, const int *rcounts, const int *displs,
                   MPI_Datatype rdt, MPI_Comm comm);
int MPI_Gather(const void *send, int scount, MPI_Datatype sdt,
               void *recv, int rcount, MPI_Datatype rdt, int root,
               MPI_Comm comm);
int MPI_Igather(const void *send, int scount, MPI_Datatype sdt,
                void *recv, int rcount, MPI_Datatype rdt, int root,
                MPI_Comm comm, MPI_Request *req);
int MPI_Scatter(const void *send, int scount, MPI_Datatype sdt,
                void *recv, int rcount, MPI_Datatype rdt, int root,
                MPI_Comm comm);
int MPI_Alltoall(const void *send, int scount, MPI_Datatype sdt,
                 void *recv, int rcount, MPI_Datatype rdt, MPI_Comm comm);
int MPI_Alltoallv(const void *send, const int *scounts, const int *sdispls,
                  MPI_Datatype sdt, void *recv, const int *rcounts,
                  const int *rdispls, MPI_Datatype rdt, MPI_Comm comm);
int MPI_Isend(const void *buf, int count, MPI_Datatype dt, int dest,
              int tag, MPI_Comm comm, MPI_Request *req);
int MPI_Irecv(void *buf, int count, MPI_Datatype dt, int src, int tag,
              MPI_Comm comm, MPI_Request *req);
int MPI_Send(const void *buf, int count, MPI_Datatype dt, int dest,
             int tag, MPI_Comm comm);
int MPI_Recv(void *buf, int count, MPI_Datatype dt, int src, int tag,
             MPI_Comm comm, MPI_Status *st);
int MPI_Sendrecv(const void *sbuf, int scount, MPI_Datatype sdt, int dest,
                 int stag, void *rbuf, int rcount, MPI_Datatype rdt,
                 int src, int rtag, MPI_Comm comm, MPI_Status *st);
int MPI_Test(MPI_Request *req, int *flag, MPI_Status *st);
int MPI_Wait(MPI_Request *req, MPI_Status *st);
int MPI_Waitall(int n, MPI_Request reqs[], MPI_Status sts[]);
int MPI_Waitsome(int incount, MPI_Request reqs[], int *outcount,
                 int indices[], MPI_Status sts[]);
int MPI_Type_contiguous(int count, MPI_Datatype old, MPI_Datatype *newt);
int MPI_Type_commit(MPI_Datatype *dt);
int MPI_Type_free(MPI_Datatype *dt);
int MPI_Type_get_extent(MPI_Datatype dt, MPI_Aint *lb, MPI_Aint *extent);
int MPI_Type_size(MPI_Datatype dt, int *size);
int MPI_Get_count(const MPI_Status *st, MPI_Datatype dt, int *count);
int MPI_Get_processor_name(char *name, int *resultlen);

#ifdef __cplusplus
}
#endif
#endif
