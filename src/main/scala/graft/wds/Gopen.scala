package graft.wds

import java.io.{FilterInputStream, IOException, InputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Shard-URL opener — the `gopen` scheme table (S8; reference
  * `webdataset/gopen.py:153-330`). Hadoop FS covers `file:`/`hdfs:`/
  * `s3a:`/`http:`; `pipe:command args…` runs the command in a shell and
  * streams its stdout, the reference's subprocess scheme
  * (`pipe:curl -s https://… | unzstd` style). Exit-status semantics
  * match gopen's Pipe: a nonzero exit raises, except SIGPIPE (141),
  * which just means the consumer stopped reading early — gopen's
  * default `ignore_status`. The status check fires at EOF as well as
  * close, so a failed producer (`pipe:false`) surfaces as a read error
  * routed through the shard-open handler policy instead of silently
  * yielding an empty shard. */
object Gopen {

  val SigPipeExit = 141

  def open(url: String, conf: Configuration): InputStream =
    if (url.startsWith("pipe:")) openPipe(url.stripPrefix("pipe:"))
    else {
      val path = new Path(url)
      path.getFileSystem(conf).open(path)
    }

  def openPipe(cmd: String): InputStream = {
    val pb = new ProcessBuilder("/bin/sh", "-c", cmd)
    // stderr must not back-pressure the producer: an unread stderr pipe
    // fills at ~64 KB and deadlocks a chatty command (curl -v …) with
    // the task blocked in read(). INHERIT streams it to the executor
    // log, where the reference's subprocess stderr also lands.
    pb.redirectError(ProcessBuilder.Redirect.INHERIT)
    val proc = pb.start()
    proc.getOutputStream.close() // no stdin; producer-only
    new FilterInputStream(proc.getInputStream) {
      private var checked = false
      private def checkStatus(): Unit = if (!checked) {
        checked = true
        // bounded: a producer that closed stdout but wedged in cleanup
        // must not hang the task at EOF
        if (!proc.waitFor(10, java.util.concurrent.TimeUnit.SECONDS)) {
          proc.destroyForcibly()
          proc.waitFor()
          throw new IOException(
            s"pipe: command still running 10s after EOF, killed: $cmd")
        }
        val code = proc.exitValue()
        if (code != 0 && code != SigPipeExit)
          throw new IOException(s"pipe: command exited $code: $cmd")
      }
      override def read(): Int = {
        val r = super.read()
        if (r < 0) checkStatus()
        r
      }
      override def read(b: Array[Byte], off: Int, len: Int): Int = {
        val r = super.read(b, off, len)
        if (r < 0) checkStatus()
        r
      }
      override def close(): Unit =
        if (checked) super.close() // EOF path already validated status
        else {
          // early close: the reader abandoned the stream — terminate
          // the producer and ignore its status (it dies of SIGPIPE/
          // SIGTERM because WE stopped, not because the data is bad);
          // escalate to SIGKILL rather than hang a task on a stubborn
          // producer
          checked = true
          proc.destroy()
          super.close()
          if (!proc.waitFor(10, java.util.concurrent.TimeUnit.SECONDS)) {
            proc.destroyForcibly()
            proc.waitFor()
          }
          ()
        }
    }
  }
}
