package graft

/** Test helper: the messages of an exception and all its causes. */
object TestErrors {
  def messageChain(t: Throwable): List[String] = {
    def chain(x: Throwable): List[String] =
      if (x == null) Nil
      else Option(x.getMessage).toList ::: chain(x.getCause)
    chain(t)
  }
}
